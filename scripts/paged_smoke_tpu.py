"""On-TPU smoke of the extended paged flash-decode variants (VERDICT r3 #4).

Runs the SAME exactness checks tests/test_paged.py validates in interpret
mode, but on the real chip (interpret=False): plain, sliding-window+sinks,
softcap, and partially-filled pages with -1 table entries. Each variant's
kernel output is compared against the gather + masked-softmax reference
computed in f32 on host.

On success, ops/paged_attention.py EXTENDED_ON_TPU is flipped to True in
the source (committed with this script's JSON output in docs/).
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def ref_attn(q, k_all, v_all, lengths, scale, window=0, sinks=None, softcap=0.0):
    s = np.einsum("bkgh,bkth->bkgt", q, k_all) * scale
    if softcap:
        s = softcap * np.tanh(s / softcap)
    pos = np.arange(k_all.shape[2])[None, :]
    L = np.asarray(lengths)[:, None]
    mask = pos <= L
    if window:
        mask &= pos > L - window
    s = np.where(mask[:, None, None, :], s, -1e30)
    if sinks is not None:
        nKV, G = q.shape[1], q.shape[2]
        sk = np.asarray(sinks).reshape(nKV, G)[None]
        m = np.maximum(s.max(-1), sk)
        e = np.exp(s - m[..., None])
        p = e / (e.sum(-1) + np.exp(sk - m))[..., None]
    else:
        p = np.exp(s - s.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
    return np.einsum("bkgt,bkth->bkgh", p, v_all)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from gptq_gguf_tpu.ops import paged_attention
    from gptq_gguf_tpu.serving import paged

    assert jax.devices()[0].platform == "tpu", "smoke must run on real TPU"

    rng = np.random.default_rng(5)
    B, nKV, G, hd, page, pps = 3, 2, 4, 128, 64, 4
    n_pages = B * pps
    lengths = np.asarray([5, 63, 170], np.int32)
    q = rng.normal(size=(B, nKV, G, hd)).astype(np.float32) * 0.5
    k_pages = rng.normal(size=(n_pages, nKV, page, hd)).astype(np.float32) * 0.2
    v_pages = rng.normal(size=(n_pages, nKV, page, hd)).astype(np.float32)
    table = np.full((B, pps), -1, np.int32)
    nxt = 0
    for b in range(B):
        for p_ in range(int(lengths[b]) // page + 1):
            table[b, p_] = nxt
            nxt += 1
    scale = 1.0 / np.sqrt(hd)
    sinks = rng.normal(size=(nKV * G,)).astype(np.float32)

    k_all = np.asarray(paged._gather_slot_kv(jnp.asarray(k_pages), jnp.asarray(table)))
    v_all = np.asarray(paged._gather_slot_kv(jnp.asarray(v_pages), jnp.asarray(table)))

    cases = {
        "plain": dict(),
        "window": dict(window=48),
        "sinks": dict(sinks=jnp.asarray(sinks)),
        "window_sinks": dict(window=48, sinks=jnp.asarray(sinks)),
        "softcap": dict(softcap=50.0),
        "softcap_window": dict(softcap=50.0, window=48),
    }
    results = {}
    ok_all = True
    for name, kw in cases.items():
        out = np.asarray(paged_attention.paged_flash_decode(
            jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
            jnp.asarray(table), jnp.asarray(lengths), scale=scale,
            interpret=False, **kw))
        rkw = {k: (sinks if k == "sinks" else v) for k, v in kw.items()}
        ref = ref_attn(q, k_all, v_all, lengths, scale, **rkw)
        err = float(np.max(np.abs(out - ref)))
        rel = err / float(np.max(np.abs(ref)) + 1e-9)
        ok = rel < 5e-3  # bf16 kernel internals vs f32 host reference
        ok_all &= ok
        results[name] = {"max_abs_err": round(err, 6),
                         "max_rel_err": round(rel, 6), "ok": ok}
        print(json.dumps({name: results[name]}), flush=True)

    # int4-packed q4 kernel (round-5 COMBINED layout: codes (page, hd) u8
    # with k|v halves on lanes, scales (hd/16, page) f32 transposed —
    # every DMA slice tile-aligned, page_size=128): quantize fresh pages
    # at the kernel's alignment and compare against the gather +
    # DEQUANTIZED reference
    from gptq_gguf_tpu.models import llama
    from gptq_gguf_tpu.serving import model as qmodel

    page4, pps4 = 128, 3
    assert paged_attention.q4_kernel_supported(page4, hd)
    n_pages4 = B * pps4
    lengths4 = np.asarray([5, 127, 300], np.int32)
    kf = rng.normal(size=(n_pages4, nKV, page4, hd)).astype(np.float32) * 0.2
    vf = rng.normal(size=(n_pages4, nKV, page4, hd)).astype(np.float32)
    table4 = np.full((B, pps4), -1, np.int32)
    nxt = 0
    for b in range(B):
        for p_ in range(int(lengths4[b]) // page4 + 1):
            table4[b, p_] = nxt
            nxt += 1
    kq, ks = qmodel._quantize_kv_q4(jnp.asarray(kf))
    vq, vs = qmodel._quantize_kv_q4(jnp.asarray(vf))
    kv_pages = jnp.concatenate([kq, vq], axis=-1)
    s_pages = jnp.concatenate([ks, vs], axis=-1).transpose(0, 1, 3, 2)
    kd_all = np.asarray(paged._gather_slot_kv(
        llama.dequant_kv_q4(kq, ks), jnp.asarray(table4)))
    vd_all = np.asarray(paged._gather_slot_kv(
        llama.dequant_kv_q4(vq, vs), jnp.asarray(table4)))
    for name, kw in {"q4_plain": dict(),
                     "q4_window_sinks_softcap": dict(
                         window=200, sinks=jnp.asarray(sinks), softcap=50.0),
                     }.items():
        out = np.asarray(paged_attention.paged_flash_decode_q4(
            jnp.asarray(q), kv_pages, s_pages,
            jnp.asarray(table4), jnp.asarray(lengths4), scale=scale,
            interpret=False, **kw))
        rkw = {k: (sinks if k == "sinks" else v) for k, v in kw.items()}
        ref = ref_attn(q, kd_all, vd_all, lengths4, scale, **rkw)
        err = float(np.max(np.abs(out - ref)))
        rel = err / float(np.max(np.abs(ref)) + 1e-9)
        ok = rel < 5e-3
        ok_all &= ok
        results[name] = {"max_abs_err": round(err, 6),
                         "max_rel_err": round(rel, 6), "ok": ok}
        print(json.dumps({name: results[name]}), flush=True)

    out = {"device": str(jax.devices()[0]), "ok": ok_all, "cases": results}
    print(json.dumps(out))
    with open("docs/PAGED_SMOKE_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
