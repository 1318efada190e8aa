"""TPU training pipeline — the JAX/optax replacement for
torch/rnnoise/train_rnnoise.py.

Defaults mirror the reference exactly: AdamW(lr 1e-3, betas (.8, .98),
eps 1e-8), LambdaLR 1/(1 + 5e-5 * step), batch 128, 2000-frame sequences,
gamma 0.25, GRU states carried (detached) across batches, optional block
sparsification after each optimizer step.

Scale-out: the batch axis shards over the device mesh (pure data parallelism —
the model is ~3 M params, so replicated weights + psum-free jit-sharded
training is optimal; XLA inserts the gradient all-reduce automatically from
the shardings).
"""

from __future__ import annotations

import argparse
import os
import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from .data import RNNoiseDataset
from .loss import rnnoise_loss
from .model import forward, init_params
from .sparsify import sparsify_step

ADAM_BETAS = (0.8, 0.98)
ADAM_EPS = 1e-8


def make_optimizer(lr: float = 1e-3, lr_decay: float = 5e-5):
    schedule = lambda step: lr / (1.0 + lr_decay * step)
    return optax.adamw(learning_rate=schedule, b1=ADAM_BETAS[0],
                       b2=ADAM_BETAS[1], eps=ADAM_EPS, weight_decay=0.01)


def make_train_step(optimizer, gamma: float = 0.25, sparse: bool = False,
                    mesh: Optional[Mesh] = None, remat: bool = True):
    """Returns jitted (params, opt_state, states, batch, step) ->
    (params, opt_state, states, metrics)."""

    def loss_fn(params, states, features, gain, vad):
        pred_gain, pred_vad, new_states = forward(params, features, states,
                                                  remat=remat)
        loss, (gl, vl) = rnnoise_loss(pred_gain, pred_vad,
                                      gain[:, 3:-1], vad[:, 3:-1], gamma)
        return loss, (gl, vl, new_states)

    def step_fn(params, opt_state, states, batch, step):
        features, gain, vad = batch
        (loss, (gl, vl, new_states)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, states, features, gain, vad)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if sparse:
            params = sparsify_step(params, step)
        metrics = dict(loss=loss, gain_loss=gl, vad_loss=vl)
        return params, opt_state, new_states, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("streams"))
        return jax.jit(step_fn,
                       in_shardings=(repl, repl, bsh, (bsh, bsh, bsh), None),
                       out_shardings=(repl, repl, bsh, repl),
                       donate_argnums=(0, 1, 2))
    return jax.jit(step_fn, donate_argnums=(0, 1, 2))


def save_checkpoint(path: str, params: Dict, opt_state, step: int,
                    config: ModelConfig, loss: float = float("nan")):
    """Epoch checkpoints (the .pth analogue, train_rnnoise.py:173-178)."""
    blob = dict(
        params=jax.tree.map(np.asarray, params),
        opt_state=jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
            opt_state),
        step=step,
        model_kwargs=dict(cond_size=config.cond_size,
                          gru_size=config.gru_size),
        loss=loss,
    )
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    params = jax.tree.map(jnp.asarray, blob["params"])
    return blob, params


def train(args):
    config = ModelConfig(cond_size=args.cond_size, gru_size=args.gru_size)
    dataset = RNNoiseDataset(args.features, args.sequence_length)
    print(f"{len(dataset)} sequences")

    key = jax.random.PRNGKey(args.seed)
    params = init_params(key, config)
    nb_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model: {nb_params} weights")

    optimizer = make_optimizer(args.lr, args.lr_decay)
    opt_state = optimizer.init(params)
    step = 0
    if args.initial_checkpoint:
        blob, params = load_checkpoint(args.initial_checkpoint)
        step = blob.get("step", 0)

    train_step = make_train_step(optimizer, args.gamma, args.sparse)

    os.makedirs(os.path.join(args.output, "checkpoints"), exist_ok=True)
    rng = np.random.default_rng(args.seed)
    states = None
    B = args.batch_size
    for epoch in range(1, args.epochs + 1):
        order = rng.permutation(len(dataset))
        n_batches = len(dataset) // B
        running = dict(loss=0.0, gain_loss=0.0, vad_loss=0.0)
        for i in range(n_batches):
            idx = order[i * B:(i + 1) * B]
            feats, gain, vad = dataset.batch(idx)
            if states is None:
                N = config.gru_size
                states = tuple(jnp.zeros((B, N), jnp.float32)
                               for _ in range(3))
            params, opt_state, states, metrics = train_step(
                params, opt_state, states,
                (jnp.asarray(feats), jnp.asarray(gain), jnp.asarray(vad)),
                jnp.asarray(step, jnp.int32))
            step += 1
            for k in running:
                running[k] += float(metrics[k])
            if (i + 1) % 10 == 0 or i + 1 == n_batches:
                msg = " ".join(f"{k}={running[k] / (i + 1):8.5f}"
                               for k in running)
                print(f"epoch {epoch} [{i + 1}/{n_batches}] {msg}")
        ckpt = os.path.join(args.output, "checkpoints",
                            f"rnnoise{args.suffix}_{epoch}.ckpt")
        save_checkpoint(ckpt, params, opt_state, step, config,
                        running["loss"] / max(1, n_batches))
    return params


def build_argparser():
    p = argparse.ArgumentParser(description="Train RNNoise on TPU/CPU (JAX)")
    p.add_argument("features", type=str)
    p.add_argument("output", type=str)
    p.add_argument("--suffix", type=str, default="")
    p.add_argument("--cond-size", type=int, default=128)
    p.add_argument("--gru-size", type=int, default=384)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--sequence-length", type=int, default=2000)
    p.add_argument("--lr-decay", type=float, default=5e-5)
    p.add_argument("--initial-checkpoint", type=str, default=None)
    p.add_argument("--gamma", type=float, default=0.25)
    p.add_argument("--sparse", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p


if __name__ == "__main__":
    train(build_argparser().parse_args())
