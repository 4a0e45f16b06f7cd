from pseudocylindrical_convolution_tpu.parallel.train import (
    TrainState, create_train_state, make_train_step, make_eval_step)
