"""GPTQ quantization CLI (reference quant/gptq/quant.py:18-271 equivalent).

Example:
  python -m gptq_gguf_tpu quantize \
    --model_name_or_path /models/Llama-3.2-1B \
    --calibration_data wikitext2 --calibration_tokens 262144 \
    --default_bit_width Q4_K --save_dir out/layers --eval_perplexity
"""

from __future__ import annotations

import argparse
import json
import os
import time

from . import common


def build_parser(p: argparse.ArgumentParser) -> None:
    common.add_model_args(p)
    common.add_data_args(p)
    common.add_mesh_args(p)
    p.add_argument("--quantizable_modules", type=str, default=".*",
                   help="regex for modules to quantize")
    p.add_argument("--quant_non_block_modules", action="store_true")
    p.add_argument("--quant_scale", type=str, default="absmax", choices=["absmax", "mse"])
    p.add_argument("--act_order", action="store_true")
    p.add_argument("--static_groups", action="store_true")
    p.add_argument("--rel_damp", type=float, default=1e-2)
    p.add_argument("--block_size", type=int, default=128)
    p.add_argument("--default_bit_width", type=str, default="Q4_K",
                   choices=["Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K"])
    p.add_argument("--bit_width_configuration", type=str, default=None,
                   help="JSON {module_suffix: Q*_K} map (quant.py:203-217)")
    p.add_argument("--rmin", type=float, default=-1.0)
    p.add_argument("--rdelta", type=float, default=0.1)
    p.add_argument("--nstep", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_perplexity", action="store_true")
    p.add_argument("--eval_sequence_length", type=int, default=4096)
    p.add_argument("--scan_batches", choices=["auto", "on", "off"], default="auto",
                   help="single-program per-block capture (device-resident activations)")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--wandb", action="store_true",
                   help="log stage timings/ppl to wandb (reference quant.py:113)")
    p.add_argument("--profile-dir", dest="profile_dir", default=None,
                   help="write a jax.profiler trace here (TensorBoard/xprof)")
    p.add_argument("--offload-activations", dest="offload_activations",
                   choices=["auto", "on", "off"], default="auto",
                   help="stage calibration activations to host between "
                        "blocks (auto: only when the set exceeds 2 GB)")
    p.add_argument("--stage-profile", dest="stage_profile", action="store_true",
                   help="accumulate per-stage wall-clock inside the "
                        "calibration walk (stage_in/capture/factorize_solve/"
                        "artifact/propagate/unstage) into stage_timings.json; "
                        "inserts device syncs at stage boundaries")
    p.add_argument("--save_dir", type=str, required=True)


def run(args) -> None:
    from ..evals.ppl import compute_perplexity
    from ..ops.gptq import GPTQConfig
    from ..ops.kquant import ScaleSearchConfig
    from ..quant import calibrate
    from ..utils.data import get_data
    from ..utils.logging import StageTimer, WandbLogger, profile_trace

    wandb_log = WandbLogger(enabled=args.wandb, project="gptq_gguf_tpu",
                            config=vars(args))
    timer = StageTimer()
    with timer.stage("load_model"):
        # host-staged: the calibration walk moves one block at a time onto
        # the chip, so checkpoints larger than HBM (8B+) quantize fine
        cfg, params = common.load_model(args, host=True)
        tokenizer = common.load_tokenizer(args)
    with timer.stage("load_calibration"):
        calib = common.load_calibration(args, cfg, tokenizer)
    mesh = common.make_mesh_from_args(args)
    if getattr(args, "multihost", False):
        import jax

        if jax.process_count() > 1:
            # multi-host recipe: every process loads the same dataset
            # deterministically and keeps only its own interleaved shard;
            # dp.shard_batch reassembles the global batch from local shards.
            # Truncate to a common length so every process steps in lockstep.
            pc = jax.process_count()
            n = len(calib) // pc
            calib = calib[jax.process_index()::pc][:n]

    if args.bit_width_configuration:
        with open(args.bit_width_configuration) as f:
            quant_config = json.load(f)
    else:
        bw = args.default_bit_width
        quant_config = {
            k: bw
            for k in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                      "down_proj", "up_proj", "embed_tokens", "lm_head")
        }

    gptq_cfg = GPTQConfig(
        rel_damp=args.rel_damp,
        block_size=args.block_size,
        act_order=args.act_order,
        static_groups=args.static_groups or args.act_order,
        scale_cfg=ScaleSearchConfig(
            quant_scale=args.quant_scale, rmin=args.rmin, rdelta=args.rdelta,
            nstep=args.nstep,
        ),
    )

    os.makedirs(args.save_dir, exist_ok=True)
    stage_times = {} if getattr(args, "stage_profile", False) else None
    t0 = time.perf_counter()
    with profile_trace(args.profile_dir), timer.stage("quantize"):
        qparams = calibrate.quantize_model(
            params, cfg, calib,
            quant_config=quant_config,
            gptq_cfg=gptq_cfg,
            save_dir=args.save_dir,
            quant_non_block=args.quant_non_block_modules,
            quantizable_regex=args.quantizable_modules,
            batch_size=args.batch_size,
            mesh=mesh,
            scan_batches={"auto": None, "on": True, "off": False}[args.scan_batches],
            verbose=args.verbose,
            stage_times=stage_times,
            offload_activations={"auto": None, "on": True, "off": False}[
                getattr(args, "offload_activations", "auto")],
        )
    print(f"Quantization took {time.perf_counter() - t0:.1f} s.")
    if stage_times is not None:
        for k, v in stage_times.items():
            timer.times[f"quantize/{k}"] = round(v, 2)
        print("stage breakdown:", json.dumps(
            {k: round(v, 2) for k, v in stage_times.items()}))

    if args.eval_perplexity:
        with timer.stage("eval_perplexity"):
            # test split loaders return the full contiguous test set for
            # wikitext2/c4 (the token count only bounds synthetic/file data)
            eval_data = get_data(
                "wikitext2" if args.calibration_data in ("wikitext2", "c4", "fineweb_edu")
                else args.calibration_data,
                100 * args.eval_sequence_length,
                args.eval_sequence_length,
                tokenizer,
                train=False,
                vocab_size=cfg.vocab_size,
            )
            ppl = compute_perplexity(qparams, cfg, eval_data)
        print(f"Wikitext-2 perplexity: {ppl:.3f}")
        wandb_log.log({"eval/perplexity": ppl})

    timer.dump(os.path.join(args.save_dir, "stage_timings.json"))
    wandb_log.log({f"time/{k}": v for k, v in timer.times.items()})
    if args.verbose:
        for stage, secs in timer.times.items():
            print(f"  {stage}: {secs:.2f}s")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    build_parser(p)
    run(p.parse_args())


if __name__ == "__main__":
    main()
