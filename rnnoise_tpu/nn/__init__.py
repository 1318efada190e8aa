from .layers import (LinearParams, conv1d_step, dense, gru_step,  # noqa: F401
                     linear, sigmoid_approx, tanh_approx)
