from lang2seg_tpu.engine.optimizer import build_optimizer, param_multipliers  # noqa: F401
from lang2seg_tpu.engine.train_state import TrainState, create_train_state, train_step  # noqa: F401
