from .state import (
    TrainState, create_train_state, make_optimizer, warmup_cosine_schedule,
    apply_updates, update_ema,
)
from .losses import (
    mae_loss_l1, mae_loss_l2, mae_loss_cosine, build_mae_loss,
    reconstruction_error_stats, cosine_loss, variance_loss,
)
from . import finetune_engine, mae_engine, ssl_engine
