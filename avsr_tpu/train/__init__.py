from avsr_tpu.train.state import (  # noqa: F401
    TrainState,
    count_trainable,
    create_optimizer,
    create_train_state,
    decay_mask,
    trainable_mask,
)
from avsr_tpu.train.step import make_eval_step, make_train_step, microbatch  # noqa: F401
