from lam_slide_tpu.train.state import TrainState, create_train_state
from lam_slide_tpu.train.steps import make_eval_step, make_train_step

__all__ = ["TrainState", "create_train_state", "make_eval_step", "make_train_step"]
