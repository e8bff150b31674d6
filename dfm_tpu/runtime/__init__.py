from .schedule import liga_schedule, step_schedule
from .train import (TrainState, create_train_state, make_optimizer,
                    make_train_step)
