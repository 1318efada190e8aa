from .rnn import ModelParams, RNNState, compute_rnn, init_rnn_state  # noqa: F401
