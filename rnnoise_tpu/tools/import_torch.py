"""Convert a reference torch checkpoint (train_rnnoise.py .pth format) into
this framework's training-params pytree.

Gate reordering: torch GRUs store gates r, z, n; the C/export order is
z, r, n (wexchange/c_export/common.py:342-353).  Matrices transpose from
torch's [out, in] to our [in, out]; conv weights go [out, in, k] ->
[k*in, out] time-major (common.py:289-294).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _swap_rz(x: np.ndarray, N: int) -> np.ndarray:
    out = x.copy()
    out[0:N] = x[N:2 * N]
    out[N:2 * N] = x[0:N]
    return out


def params_from_torch_state_dict(sd: Dict) -> Dict:
    def arr(name):
        v = sd[name]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    def conv(name):
        w = arr(f"{name}.weight")                      # [out, in, k]
        w = np.transpose(w, (2, 1, 0)).reshape(-1, w.shape[0])
        return dict(w=w, b=arr(f"{name}.bias"))

    def gru(name):
        w_ih = arr(f"{name}.weight_ih_l0")             # [3N, in], r/z/n
        w_hh = arr(f"{name}.weight_hh_l0")
        b_ih = arr(f"{name}.bias_ih_l0")
        b_hh = arr(f"{name}.bias_hh_l0")
        N = w_ih.shape[0] // 3
        return dict(
            w_in=_swap_rz(w_ih, N).T.copy(),
            b_in=_swap_rz(b_ih, N),
            w_rec=_swap_rz(w_hh, N).T.copy(),
            b_rec=_swap_rz(b_hh, N),
        )

    def dense(name):
        return dict(w=arr(f"{name}.weight").T.copy(), b=arr(f"{name}.bias"))

    return dict(
        conv1=conv("conv1"), conv2=conv("conv2"),
        gru1=gru("gru1"), gru2=gru("gru2"), gru3=gru("gru3"),
        dense_out=dense("dense_out"), vad_dense=dense("vad_dense"),
    )


def load_torch_checkpoint(path: str) -> Dict:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    return params_from_torch_state_dict(sd)
