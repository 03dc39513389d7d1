"""Bisect the RN152 bs256 train step (VERDICT r3 item 1: 2.2% MFU).

Round-4 finding from pass 1: the full step's compiled peak memory is
15.3 GB on a ~16 GB chip (temp 14.2 GB) with all convs bf16 — the XLA
rematerializer is active and the schedule collapses. Pass 2 quantifies:
batch-size scaling, microbatched gradient accumulation (memory / 4, zero
extra FLOPs), and fwd-only baselines.

All variants device-resident, chained through scalar fetch barriers.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from salve_tpu.training import train as train_lib
from salve_tpu.training import transforms
from salve_tpu.training.config import TrainingConfig

REPS = 4
N_IMGS = 4


def report(name, compiled, dt, batch):
    flops = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass
    mem = {}
    try:
        ma = compiled.memory_analysis()
        for k in ("temp_size_in_bytes", "peak_memory_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                mem[k + "_gb"] = round(int(v) / 2**30, 2)
    except Exception:
        pass
    rec = {"variant": name, "step_s": round(dt, 4), "pairs_per_s": round(batch / dt, 1), "mem": mem}
    if flops:
        rec["tflops"] = round(flops / 1e12, 2)
        rec["mfu_vs_197"] = round(flops / dt / 197e12, 3)
    print(json.dumps(rec), flush=True)


def fresh_state(cfg):
    return train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=1000)


def time_state_step(jstep, state, args, reps=REPS):
    s, out = jstep(state, *args)
    float(out if not isinstance(out, dict) else out["loss"])
    t0 = time.time()
    for _ in range(reps):
        s, out = jstep(s, *args)
    float(out if not isinstance(out, dict) else out["loss"])
    return (time.time() - t0) / reps


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    cfg = TrainingConfig(
        num_layers=152, batch_size=256, resize_h=234, resize_w=234,
        train_h=224, train_w=224,
        modalities=("ceiling_rgb_texture", "floor_rgb_texture"),
    )
    rng = np.random.default_rng(0)
    imgs224 = jnp.asarray(rng.integers(
        0, 255, (256, N_IMGS, 224, 224, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, (256,)).astype(np.int32))

    def loss_of(st_apply, batch_stats, params, im, lb):
        logits, new_ms = st_apply(
            {"params": params, "batch_stats": batch_stats},
            [im[:, i] for i in range(N_IMGS)], train=True,
            mutable=["batch_stats"])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, lb).mean(), new_ms

    # ---- noaug bs256 (isolate: augmentation out) ---------------------------
    def step_noaug(st, im, lb):
        im = transforms.normalize_batch(im.astype(jnp.float32))

        def loss_fn(params):
            return loss_of(st.apply_fn, st.batch_stats, params, im, lb)

        (loss, new_ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        st = st.apply_gradients(grads=grads, batch_stats=new_ms["batch_stats"])
        return st, loss

    jstep = jax.jit(step_noaug, donate_argnums=(0,))
    st = fresh_state(cfg)
    compiled = jstep.lower(st, imgs224, labels).compile()
    dt = time_state_step(jstep, st, (imgs224, labels))
    report("noaug_bs256", compiled, dt, 256)

    # ---- accum: 4 microbatches of 64 via lax.scan --------------------------
    def step_accum(st, im, lb):
        im = transforms.normalize_batch(im.astype(jnp.float32))
        mb_im = im.reshape(4, 64, *im.shape[1:])
        mb_lb = lb.reshape(4, 64)

        def body(carry, mb):
            grads_acc, loss_acc, bs = carry
            m_im, m_lb = mb

            def loss_fn(params):
                return loss_of(st.apply_fn, bs, params, m_im, m_lb)

            (loss, new_ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, new_ms["batch_stats"]), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, st.params)
        (grads, loss, new_bs), _ = jax.lax.scan(
            body, (zero_grads, 0.0, st.batch_stats), (mb_im, mb_lb))
        grads = jax.tree_util.tree_map(lambda g: g / 4.0, grads)
        st = st.apply_gradients(grads=grads, batch_stats=new_bs)
        return st, loss / 4.0

    jstep = jax.jit(step_accum, donate_argnums=(0,))
    st = fresh_state(cfg)
    compiled = jstep.lower(st, imgs224, labels).compile()
    dt = time_state_step(jstep, st, (imgs224, labels))
    report("accum_4x64", compiled, dt, 256)

    # ---- full bs64 (batch scaling) ------------------------------------------
    im64, lb64 = imgs224[:64], labels[:64]
    jstep = jax.jit(step_noaug, donate_argnums=(0,))
    st = fresh_state(cfg)
    compiled = jstep.lower(st, im64, lb64).compile()
    dt = time_state_step(jstep, st, (im64, lb64))
    report("noaug_bs64", compiled, dt, 64)

    # ---- gradonly bs256 ------------------------------------------------------
    st = fresh_state(cfg)

    def gradonly(params, bs, im, lb, chain):
        im = transforms.normalize_batch(im.astype(jnp.float32) + chain * 0.0)

        def loss_fn(p):
            return loss_of(st.apply_fn, bs, p, im, lb)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        return loss + sum(jnp.sum(jnp.abs(l[:1])) for l in leaves[:3])

    jg = jax.jit(gradonly)
    compiled = jg.lower(st.params, st.batch_stats, imgs224, labels,
                        jnp.float32(0.0)).compile()
    chain = jg(st.params, st.batch_stats, imgs224, labels, jnp.float32(0.0))
    float(chain)
    t0 = time.time()
    chain = jnp.float32(0.0)
    for _ in range(REPS):
        chain = jg(st.params, st.batch_stats, imgs224, labels, chain)
    float(chain)
    report("gradonly_bs256", compiled, (time.time() - t0) / REPS, 256)

    # ---- fwdtrain bs256 -------------------------------------------------------
    def fwdtrain(params, bs, im, lb, chain):
        im = transforms.normalize_batch(im.astype(jnp.float32) + chain * 0.0)
        loss, _ = loss_of(st.apply_fn, bs, params, im, lb)
        return loss

    jf = jax.jit(fwdtrain)
    compiled = jf.lower(st.params, st.batch_stats, imgs224, labels,
                        jnp.float32(0.0)).compile()
    chain = jf(st.params, st.batch_stats, imgs224, labels, jnp.float32(0.0))
    float(chain)
    t0 = time.time()
    chain = jnp.float32(0.0)
    for _ in range(REPS):
        chain = jf(st.params, st.batch_stats, imgs224, labels, chain)
    float(chain)
    report("fwdtrain_bs256", compiled, (time.time() - t0) / REPS, 256)


if __name__ == "__main__":
    main()
