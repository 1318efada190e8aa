"""Generate a deterministic random RNNoise model and export it with the
*reference's own exporter* (torch/rnnoise/dump_rnnoise_weights.py) so the
oracle C library and our framework load byte-identical weights.

The real trained model artifact is distributed out-of-band
(download_model.sh, not in the reference tree), so golden-parity testing uses
a seeded random model instead — parity of the *computation* is independent of
the weight values.
"""

import os
import subprocess
import sys

import numpy as np
import torch

REF = "/root/reference"
SEED = 1234


def make_model(cond_size=128, gru_size=384):
    sys.path.insert(0, os.path.join(REF, "torch", "rnnoise"))
    import rnnoise  # reference model definition

    torch.manual_seed(SEED)
    model = rnnoise.RNNoise(cond_size=cond_size, gru_size=gru_size)

    rng = np.random.default_rng(SEED)
    with torch.no_grad():
        # Scale weights down so activations stay sane, then block-sparsify the
        # GRU matrices with a random 8(out) x 4(in) block mask to exercise the
        # sparse export/densify path (densities ~ the reference's .3/.2/.5).
        for name, p in model.named_parameters():
            p.mul_(0.3)
        for gru in (model.gru1, model.gru2, model.gru3):
            for wname in ("weight_ih_l0", "weight_hh_l0"):
                W = getattr(gru, wname).detach().numpy()
                O, I = W.shape
                mask = rng.random((O // 8, I // 4)) < 0.45
                Wm = W.reshape(O // 8, 8, I // 4, 4)
                Wm *= mask[:, None, :, None]
                getattr(gru, wname).copy_(torch.from_numpy(W.reshape(O, I)))
    return model


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    model = make_model()
    ckpt = {
        "model_args": (),
        "model_kwargs": {"cond_size": 128, "gru_size": 384},
        "state_dict": model.state_dict(),
    }
    ckpt_path = os.path.join(outdir, "oracle_model.pth")
    torch.save(ckpt, ckpt_path)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([
        os.path.join(REF, "torch", "rnnoise"),
        os.path.join(REF, "torch", "weight-exchange"),
        env.get("PYTHONPATH", ""),
    ])
    subprocess.run(
        [sys.executable, os.path.join(REF, "torch", "rnnoise",
                                      "dump_rnnoise_weights.py"),
         "--quantize", ckpt_path, outdir],
        check=True, env=env,
    )


if __name__ == "__main__":
    main(sys.argv[1])
