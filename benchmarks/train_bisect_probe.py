#!/usr/bin/env python
"""Bisect the B=4 bf16 packed no-remat train step (687.7 ms, DEVNOTES r3).

Times, under the same jit/donation regime as the real step:
  - fwd+loss only (no grad) — train-mode forward w/ BN stat mutation
  - grad wrt decoder+heads only (trunk activations constant)
  - grad wrt trunk only (needs decoder dgrad chain)
  - full grad, no optimizer
  - full step (grad + adam update) with and without augmentation

The deltas locate the backward milliseconds (decoder wgrad vs trunk bwd
vs optimizer) so the next kernel (e.g. a Pallas wgrad for the packed
decoder, mirroring the round-3 dgrad win) goes where the time is.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TARGET = (128, 224, 288)
B = 4


def main():
    global TARGET, B
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke test at toy shapes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        TARGET, B = (16, 32, 32), 1
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from bodyct_dram_emph_subtype_tpu.losses import (
        interval_regression_loss, segmentation_losses)
    from bodyct_dram_emph_subtype_tpu.models import blocks, get_model_by_name
    from bodyct_dram_emph_subtype_tpu.ops.resize import resize_nearest
    from bodyct_dram_emph_subtype_tpu.train import (
        TrainState, make_optimizer, make_reg_train_step)
    from bodyct_dram_emph_subtype_tpu.train.steps import (
        CLE_RATIO_MAP, PSE_RATIO_MAP, _augment_batch, _forward_train,
        apply_updates, generate_regression_labels)
    blocks.set_conv3d_mode("roll")

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, *TARGET).astype(np.float32))
    lungs = jnp.ones((B, *TARGET), jnp.float32)
    ems = jnp.asarray((rng.rand(B, *TARGET) > 0.9).astype(np.float32))
    batch = {
        "image": images, "lung_mask": lungs, "em_mask": ems,
        "cls_label": jnp.asarray(rng.randint(0, 6, B), jnp.int32),
        "pse_label": jnp.asarray(rng.randint(0, 3, B), jnp.int32),
    }
    lr = jnp.asarray(1e-4)
    wc = jnp.ones(6) / 6
    wp = jnp.ones(3) / 3
    key = jax.random.PRNGKey(1)

    model = get_model_by_name("med3ddram", dtype=jnp.bfloat16,
                              remat=False, packed_decoder=True)
    x0 = jnp.zeros((1, *TARGET, 1), jnp.float32)
    v = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
        jax.random.PRNGKey(0))
    tx = make_optimizer()
    state = TrainState.create(dict(v), tx)

    def _timeit(name, fn, *fargs, n=4, trials=3, fetch=None):
        try:
            out = fn(*fargs)
            (fetch or (lambda o: np.asarray(jax.tree.leaves(o)[0])))(out)
            best = 1e9
            for _ in range(trials):
                t0 = time.time()
                for _ in range(n):
                    out = fn(*fargs)
                (fetch or (lambda o: np.asarray(jax.tree.leaves(o)[0])))(out)
                best = min(best, (time.time() - t0) / n * 1e3)
            print(json.dumps({"case": name, "ms": round(best, 1)}),
                  flush=True)
            return best
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": name, "error": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)
            return None

    def make_loss(st, x, lungs5, ems5, cle_b, pse_b, w_cle, w_pse, binary):
        def loss_fn(params):
            s2 = st.replace(params=params)
            dense, regs, new_stats = _forward_train(model, s2, x, lungs5)
            l_c = interval_regression_loss(regs[0], cle_b, w_cle)
            l_p = interval_regression_loss(regs[1], pse_b, w_pse)
            seg_labels = resize_nearest(
                ems5 * binary[:, None, None, None, None].astype(jnp.float32),
                dense[0].shape[1:4], (1, 2, 3))
            lung_labels = resize_nearest(lungs5, dense[0].shape[1:4],
                                         (1, 2, 3))
            mul_l, seg_l = segmentation_losses(dense[0], dense[1],
                                               seg_labels, lung_labels)
            return l_c + l_p + 2.0 * mul_l + seg_l
        return loss_fn

    def prep(st, images, lungs, ems, key):
        img, lu, em = _augment_batch(images, lungs, ems, key)
        x = img[..., None]
        lungs5 = lu.astype(jnp.float32)[..., None]
        ems5 = em.astype(jnp.float32)[..., None]
        cle_l = batch["cls_label"].astype(jnp.int32)
        pse_l = batch["pse_label"].astype(jnp.int32)
        cle_b = generate_regression_labels(cle_l, CLE_RATIO_MAP)
        pse_b = generate_regression_labels(pse_l, PSE_RATIO_MAP)
        binary = jnp.logical_or(cle_l > 0, pse_l > 0)
        return make_loss(st, x, lungs5, ems5, cle_b, pse_b,
                         wc[cle_l], wp[pse_l], binary)

    # 1. fwd + loss only
    @jax.jit
    def fwd_loss(st, images, lungs, ems, key):
        return prep(st, images, lungs, ems, key)(st.params)

    _timeit("fwd_loss", fwd_loss, state, images, lungs, ems, key,
            fetch=lambda o: float(o))

    # 2. grad wrt decoder+heads only
    @jax.jit
    def grad_dec(st, images, lungs, ems, key):
        loss_fn = prep(st, images, lungs, ems, key)
        dec_keys = [k for k in st.params if k != "trunk"]

        def f(sub):
            p = dict(st.params)
            p.update(sub)
            return loss_fn(p)
        return jax.grad(f)({k: st.params[k] for k in dec_keys})

    _timeit("grad_decoder_only", grad_dec, state, images, lungs, ems, key)

    # 3. grad wrt trunk only
    @jax.jit
    def grad_trunk(st, images, lungs, ems, key):
        loss_fn = prep(st, images, lungs, ems, key)

        def f(sub):
            p = dict(st.params)
            p.update(sub)
            return loss_fn(p)
        return jax.grad(f)({"trunk": st.params["trunk"]})

    _timeit("grad_trunk_only", grad_trunk, state, images, lungs, ems, key)

    # 4. full grad, no optimizer
    @jax.jit
    def grad_all(st, images, lungs, ems, key):
        return jax.grad(prep(st, images, lungs, ems, key))(st.params)

    _timeit("grad_all", grad_all, state, images, lungs, ems, key)

    # 5. optimizer update alone (grads = params scaled)
    grads0 = jax.tree.map(lambda p: p * 1e-3 if jnp.issubdtype(
        p.dtype, jnp.floating) else p, dict(state.params))

    @jax.jit
    def opt_only(st, grads, lr):
        return apply_updates(st, grads, tx, lr)

    _timeit("optimizer_update", opt_only, state, grads0, lr,
            fetch=lambda o: np.asarray(jax.tree.leaves(o.params)[0][..., :1]))

    # 6. real full step, with and without augmentation
    for aug in (True, False):
        step = make_reg_train_step(model, tx, num_data_shards=1,
                                   augment=aug, donate=False)
        name = "full_step_aug" if aug else "full_step_noaug"
        _timeit(name, step, state, batch, lr, wc, wp, key,
                fetch=lambda o: float(o[1]["loss"]), n=3)


if __name__ == "__main__":
    main()
