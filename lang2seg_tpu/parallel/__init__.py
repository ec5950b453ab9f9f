from lang2seg_tpu.parallel.mesh import make_mesh, batch_spec, replicate_spec  # noqa: F401
from lang2seg_tpu.parallel.train import make_sharded_train_step, shard_batch  # noqa: F401
