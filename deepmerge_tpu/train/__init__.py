from deepmerge_tpu.train.losses import (  # noqa: F401
    contrastive_pair_loss,
    multi_loss,
    class_loss,
)
from deepmerge_tpu.train.loop import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    train_epoch,
    lr_schedule,
)
