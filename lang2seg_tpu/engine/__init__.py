from lang2seg_tpu.engine.optimizer import build_optimizer, param_multipliers  # noqa: F401
from lang2seg_tpu.engine.train_state import (  # noqa: F401
    TrainState, create_train_state, make_train_step)
