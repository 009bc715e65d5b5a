from gltvae.train.state import TrainState, create_train_state
from gltvae.train.steps import make_train_steps, make_eval_step
from gltvae.train.loop import Trainer
