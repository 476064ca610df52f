"""Round 2 of the engine-vs-lab contradiction hunt.

unrolled_24sets_bf16_args reads 1.116 ms/layer (matmuls only) => 35.7 ms
for 32 layers, yet bench_engine's full step (matmuls + attention + scatter
+ lm_head) reads 27.6 ms. Experiments:

  A. bench_engine at steps 8 / 32 / 96 (timing-loop consistency)
  B. full forward_cached-replica layer (qkv/attn/scatter/o/gateup/down,
     norms, bf16, (B,1,H) activations) x 32 distinct sets, pipelined
  C. the same replica minus attention+scatter (matmuls+norms only)
"""

import json
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import bench
    from gptq_gguf_tpu.models import llama
    from gptq_gguf_tpu.ops import qmatmul
    from gptq_gguf_tpu.serving import model as qmodel

    # A: engine bench at several step counts
    for steps in (8, 32, 96):
        eng = bench.bench_engine(steps=steps)
        print(json.dumps({"engine_steps": steps,
                          "ms_per_step": eng["ms_per_step"],
                          "tokens_per_s": eng["tokens_per_s"]}), flush=True)

    rng = np.random.default_rng(1)
    B, H, I, KV, L = 8, 4096, 14336, 1024, 32
    mm = qmatmul.dequant_matmul

    def mk_set():
        s = {
            "input_layernorm": jnp.ones((H,), jnp.bfloat16),
            "post_attention_layernorm": jnp.ones((H,), jnp.bfloat16),
            "q_proj": bench.synth_v2(rng, H, H),
            "k_proj": bench.synth_v2(rng, KV, H),
            "v_proj": bench.synth_v2(rng, KV, H),
            "o_proj": bench.synth_v2(rng, H, H),
            "gate_proj": bench.synth_v2(rng, I, H),
            "up_proj": bench.synth_v2(rng, I, H),
            "down_proj": bench.synth_v2(rng, H, I),
        }
        return qmodel.fuse_layer_projections(s)

    sets = [mk_set() for _ in range(L)]
    bytes_layer = sum(bench.rql_bytes(sets[0][k]) for k in
                      ("qkv_proj", "o_proj", "gateup_proj", "down_proj"))

    max_len = 2048
    fill = 148
    k_cache = [jax.random.normal(jax.random.PRNGKey(i), (B, 8, max_len, 128),
                                 jnp.bfloat16) for i in range(L)]
    v_cache = [jax.random.normal(jax.random.PRNGKey(100 + i),
                                 (B, 8, max_len, 128), jnp.bfloat16)
               for i in range(L)]
    lengths = jnp.full((B,), fill, jnp.int32)
    cfg = llama.LlamaConfig(
        vocab_size=128256, hidden_size=H, intermediate_size=I,
        num_hidden_layers=L, num_attention_heads=32, num_key_value_heads=8,
        head_dim=128, rope_theta=500000.0, max_position_embeddings=max_len)
    cos, sin = llama.rope_cos_sin(cfg, lengths[:, None])

    def layer_fwd(x, lw, kc, vc, with_attn):
        h = llama.rms_norm(x, lw["input_layernorm"], 1e-5)
        qkv = mm(h.reshape(B, H), lw["qkv_proj"]).reshape(B, 1, -1)
        q = qkv[..., :H]
        k = qkv[..., H:H + KV]
        v = qkv[..., H + KV:]
        if with_attn:
            qh = q.reshape(B, 1, 32, 128).transpose(0, 2, 1, 3)
            kh = k.reshape(B, 1, 8, 128).transpose(0, 2, 1, 3)
            vh = v.reshape(B, 1, 8, 128).transpose(0, 2, 1, 3)
            qh, kh = llama.apply_rope(qh, kh, cos, sin)
            bidx = jnp.arange(B)[:, None]
            kc = kc.at[bidx, :, lengths[:, None], :].set(
                kh.transpose(0, 2, 1, 3).astype(kc.dtype), mode="drop")
            vc = vc.at[bidx, :, lengths[:, None], :].set(
                vh.transpose(0, 2, 1, 3).astype(vc.dtype), mode="drop")
            attn = llama.flash_attention(qh.astype(jnp.bfloat16), kc, vc,
                                         lengths[:, None],
                                         dynamic_length=True)
            a = attn.transpose(0, 2, 1, 3).reshape(B, 1, H)
        else:
            a = q
        o = mm(a.reshape(B, H), lw["o_proj"]).reshape(B, 1, H).astype(x.dtype)
        x = x + o
        h = llama.rms_norm(x, lw["post_attention_layernorm"], 1e-5)
        gu = mm(h.reshape(B, H), lw["gateup_proj"])
        d = mm(jax.nn.silu(gu[:, :I]) * gu[:, I:], lw["down_proj"])
        x = x + d.reshape(B, 1, H).astype(x.dtype)
        return x, kc, vc

    from functools import partial

    @partial(jax.jit, static_argnames=("with_attn",))
    def run_replica(x, sets, k_cache, v_cache, with_attn):
        nk, nv = [], []
        for i in range(L):
            x, kc, vc = layer_fwd(x, sets[i], k_cache[i], v_cache[i],
                                  with_attn)
            nk.append(kc)
            nv.append(vc)
        return x, nk, nv

    probe = jax.jit(lambda x: x.ravel()[:8])

    def timed(with_attn, R=5):
        x = jnp.asarray(rng.normal(size=(B, 1, H))).astype(jnp.bfloat16)
        kc, vc = k_cache, v_cache
        x, kc, vc = run_replica(x, sets, kc, vc, with_attn)
        np.asarray(probe(x))
        best = float("inf")
        for _ in range(2):
            pending = deque()
            t0 = time.time()
            for _ in range(R):
                x, kc, vc = run_replica(x, sets, kc, vc, with_attn)
                pending.append(probe(x))
                if len(pending) > 1:
                    np.asarray(pending.popleft())
            while pending:
                np.asarray(pending.popleft())
            best = min(best, (time.time() - t0) / R)
        return best

    dt = timed(True)
    print(json.dumps({"replica_full_ms_per_step": round(dt * 1e3, 2),
                      "weights_eff_bw_gbs": round(bytes_layer * L / dt / 1e9, 1)}),
          flush=True)
    dt = timed(False)
    print(json.dumps({"replica_noattn_ms_per_step": round(dt * 1e3, 2),
                      "weights_eff_bw_gbs": round(bytes_layer * L / dt / 1e9, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
