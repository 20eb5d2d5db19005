from sfmnext_tpu.training.builder import ModelBundle, build_models, init_params  # noqa: F401
from sfmnext_tpu.training.step import TrainState, make_train_step, make_optimizer  # noqa: F401
