"""End-to-end 8B-shapes pipeline run on the real chip (VERDICT r2 #3).

One command: synthesizes a Llama-3-8B-shaped checkpoint (random weights,
real shapes: d_col=14336 down-proj solves), then drives the REAL pipeline —

    quantize (GPTQ, synthetic calibration) -> pack (GGUF Q4_K) ->
    GGUF-direct perplexity -> engine decode smoke

— recording per-stage wall-times into PIPELINE_8B_r04.json. The CPU drive
(scripts/verify_drive_cpu.sh) proves plumbing at toy shapes; this proves
the memory plan and solve/pack/serve throughput at production shapes.

Usage: python scripts/pipeline_8b.py [--workdir /tmp/pipe8b] [--layers 32]
(--layers 2 for a quick smoke; the committed JSON uses the full 32.)
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

CFG = {
    "architectures": ["LlamaForCausalLM"],
    "model_type": "llama",
    "vocab_size": 128256,
    "hidden_size": 4096,
    "intermediate_size": 14336,
    "num_hidden_layers": 32,
    "num_attention_heads": 32,
    "num_key_value_heads": 8,
    "head_dim": 128,
    "rms_norm_eps": 1e-5,
    "rope_theta": 500000.0,
    "max_position_embeddings": 8192,
    "tie_word_embeddings": False,
    "torch_dtype": "float16",
}


def synth_checkpoint(model_dir: Path, n_layers: int, rng):
    """Write a sharded fp16 safetensors checkpoint with 8B shapes."""
    from safetensors.numpy import save_file

    model_dir.mkdir(parents=True, exist_ok=True)
    cfg = dict(CFG, num_hidden_layers=n_layers)
    with open(model_dir / "config.json", "w") as f:
        json.dump(cfg, f)

    H, I, V = cfg["hidden_size"], cfg["intermediate_size"], cfg["vocab_size"]
    kvd = cfg["num_key_value_heads"] * cfg["head_dim"]

    def w(shape, scale=0.02):
        return (rng.standard_normal(shape, dtype=np.float32) * scale).astype(
            np.float16)

    save_file({"model.embed_tokens.weight": w((V, H)),
               "model.norm.weight": np.ones((H,), np.float16),
               "lm_head.weight": w((V, H))},
              str(model_dir / "model-head.safetensors"))
    for li in range(n_layers):
        p = f"model.layers.{li}."
        t = {
            p + "input_layernorm.weight": np.ones((H,), np.float16),
            p + "post_attention_layernorm.weight": np.ones((H,), np.float16),
            p + "self_attn.q_proj.weight": w((H, H)),
            p + "self_attn.k_proj.weight": w((kvd, H)),
            p + "self_attn.v_proj.weight": w((kvd, H)),
            p + "self_attn.o_proj.weight": w((H, H)),
            p + "mlp.gate_proj.weight": w((I, H)),
            p + "mlp.up_proj.weight": w((I, H)),
            p + "mlp.down_proj.weight": w((H, I)),
        }
        save_file(t, str(model_dir / f"model-{li:03d}.safetensors"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/pipe8b")
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--calib-tokens", type=int, default=8192)
    ap.add_argument("--out", default="PIPELINE_8B_r05.json")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip-synth", action="store_true",
                    help="reuse an existing workdir/model checkpoint "
                         "(e.g. re-measuring quantize after a code change)")
    args = ap.parse_args()

    wd = Path(args.workdir)
    model_dir = wd / "model"
    if args.skip_synth and not model_dir.exists():
        sys.exit(f"--skip-synth: no checkpoint at {model_dir}")
    if not args.skip_synth:
        if wd.exists():
            shutil.rmtree(wd)
        wd.mkdir(parents=True)
    art_dir = wd / "artifacts"
    if art_dir.exists():
        shutil.rmtree(art_dir)
    gguf = wd / "model-Q4_K.gguf"
    times = {"layers": args.layers}
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR="/root/repo/.jax_cache")

    t0 = time.time()
    if not args.skip_synth:
        synth_checkpoint(model_dir, args.layers, np.random.default_rng(0))
    times["synth_checkpoint_s"] = round(time.time() - t0, 1)
    print(json.dumps({"stage": "synth", "s": times["synth_checkpoint_s"],
                      "skipped": args.skip_synth}), flush=True)

    def run(stage, cmd):
        t0 = time.time()
        r = subprocess.run([sys.executable, "-m", "gptq_gguf_tpu"] + cmd,
                           cwd="/root/repo", env=env,
                           capture_output=True, text=True)
        times[f"{stage}_s"] = round(time.time() - t0, 1)
        ok = r.returncode == 0
        print(json.dumps({"stage": stage, "s": times[f"{stage}_s"],
                          "ok": ok}), flush=True)
        if not ok:
            print(r.stdout[-2000:], file=sys.stderr)
            print(r.stderr[-4000:], file=sys.stderr)
            sys.exit(1)
        return r

    run("quantize", [
        "quantize", "--model_name_or_path", str(model_dir),
        "--calibration_data", "synthetic",
        "--calibration_tokens", str(args.calib_tokens),
        "--calibration_sequence_length", "512",
        "--default_bit_width", "Q4_K",
        "--dtype", "bfloat16",
        "--stage-profile",
        "--save_dir", str(art_dir),
    ])
    # per-stage walk breakdown (VERDICT r4 #5): where the solve time goes
    st_path = art_dir / "stage_timings.json"
    if st_path.exists():
        with open(st_path) as f:
            times["quantize_stages"] = {
                k: v for k, v in json.load(f).items()
                if k.startswith("quantize/")}

    run("pack", [
        "pack", "--model_dir", str(model_dir), "--quant_dir", str(art_dir),
        "--outfile", str(gguf), "--outtype", "f16",
    ])
    times["gguf_gb"] = round(gguf.stat().st_size / 1e9, 2)

    r = run("ppl_gguf", [
        "ppl", "--gguf-file", str(gguf), "--datasets", "synthetic",
        "--sequence_length", "512", "--eval_tokens", "4096",
    ])
    for line in r.stdout.splitlines():
        if "ppl" in line.lower():
            times["ppl_line"] = line.strip()[:200]

    # engine decode smoke straight off the GGUF
    t0 = time.time()
    smoke = subprocess.run(
        [sys.executable, "-c", """
import sys, time, json
sys.path.insert(0, '.')
import numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
from gptq_gguf_tpu.serving import model as qmodel, engine

params, cfg = qmodel.load_gguf_for_serving(%r)
eng = engine.ContinuousBatchingEngine(params, cfg, num_slots=8, max_len=512)
rng = np.random.default_rng(0)
# warmup: compile the prefill bucket + the auto decode-block programs the
# timed run will use (same prompt bucket, same max_new_tokens); round 4's
# smoke timed its own compiles and read 85x under the bench
for _ in range(2):
    eng.submit(rng.integers(0, cfg.vocab_size, (64,)), 32)
eng.run_until_done()
eng.completed.clear()
for _ in range(8):
    eng.submit(rng.integers(0, cfg.vocab_size, (64,)), 32)
t0 = time.time()
done = eng.run_until_done()
gen = sum(len(r.output) for r in done)
print(json.dumps({'gen_tokens': gen, 'tok_per_s': round(gen/(time.time()-t0), 1)}))
""" % str(gguf)],
        cwd="/root/repo", env=env, capture_output=True, text=True)
    times["serve_smoke_s"] = round(time.time() - t0, 1)
    if smoke.returncode == 0:
        times["serve_smoke"] = json.loads(smoke.stdout.strip().splitlines()[-1])
    else:
        times["serve_smoke_err"] = smoke.stderr[-1500:]
    print(json.dumps({"stage": "serve_smoke", "s": times["serve_smoke_s"]}),
          flush=True)

    # derived GPTQ throughput (VERDICT r3 #6): weights quantized per second
    # of the quantize stage. The stage includes calibration forwards +
    # Hessian capture + packing artifacts, so this UNDERSTATES the pure
    # solve rate — it is the honest end-to-end number ROADMAP item 3 cites.
    H, I = CFG["hidden_size"], CFG["intermediate_size"]
    kvd = CFG["num_key_value_heads"] * CFG["head_dim"]
    per_layer = H * (H + 2 * kvd) + H * H + 2 * H * I + I * H
    times["weights_quantized"] = per_layer * args.layers
    times["quantize_mw_per_s"] = round(
        times["weights_quantized"] / times["quantize_s"] / 1e6, 1)

    times["total_s"] = round(sum(v for k, v in times.items()
                                 if isinstance(v, (int, float))
                                 and k.endswith("_s")), 1)
    with open(args.out, "w") as f:
        json.dump(times, f, indent=1)
    print(json.dumps(times))
    if not args.keep:
        shutil.rmtree(wd)


if __name__ == "__main__":
    main()
