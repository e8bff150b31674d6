from .checkpoint import CheckpointManager
from .config import Config, load_config, merge_options
from .schedule import liga_schedule, step_schedule
from .train import (TrainState, create_train_state, make_optimizer,
                    make_train_step)
