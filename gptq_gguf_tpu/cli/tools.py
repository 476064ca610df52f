"""Pipeline-tool subcommands: pack, split, stitch, convert-config, build-db,
ppl, search, serve. Each mirrors a reference CLI (SURVEY.md §1 L3/L4)."""

from __future__ import annotations

import argparse
import functools
import json
import sys

from . import common


# -- pack (pack_gptq_into_gguf.py) -----------------------------------------


def build_pack(p: argparse.ArgumentParser):
    p.add_argument("--model_dir", help="HF checkpoint")
    p.add_argument("--quant_dir", default=None, help="calibration artifacts")
    p.add_argument("--outfile")
    p.add_argument("--outtype", default=None,
                   choices=["f32", "f16", "bf16", "q8_0", "auto"],
                   help="format for non-artifact tensors (reference "
                        "--outtype; 'auto' picks the 16-bit float matching "
                        "the checkpoint dtype; tq1_0/tq2_0 ternary are not "
                        "supported)")
    p.add_argument("--outtype_fallback", default="f16", choices=["f16", "f32"],
                   help="legacy alias of --outtype (f16/f32 only)")
    p.add_argument("--vocab-only", action="store_true",
                   help="write metadata + vocab, no tensors")
    p.add_argument("--metadata", default=None,
                   help="JSON file of extra general.* metadata overrides")
    p.add_argument("--model-name", default=None,
                   help="override general.name")
    p.add_argument("--print-supported-models", action="store_true")
    p.add_argument("--split-max-tensors", type=int, default=0,
                   help="shard the output GGUF every N tensors")
    p.add_argument("--split-max-size", default=None,
                   help="shard the output GGUF at ~SIZE (e.g. 40G)")
    p.add_argument("--no-tensor-first-split", action="store_true")
    p.add_argument("--mmproj", action="store_true",
                   help="write the vision tower + projector as an mmproj "
                        "GGUF instead of the text model (reference "
                        "--mmproj mode)")


def _resolve_outtype(args):
    from ..formats.ggml import GGMLQuantizationType as T

    name = args.outtype or args.outtype_fallback
    if name == "auto":
        # highest-fidelity 16-bit type matching the checkpoint dtype
        # (reference --outtype auto)
        import json as _json
        from pathlib import Path

        idx = Path(args.model_dir) / "model.safetensors.index.json"
        files = sorted(Path(args.model_dir).glob("*.safetensors"))
        name = "f16"
        if files:
            from safetensors import safe_open

            with safe_open(str(files[0]), framework="numpy") as f:
                for k in f.keys():
                    sl = f.get_slice(k)
                    name = "bf16" if "BF16" in str(sl.get_dtype()).upper() else "f16"
                    break
    return {"f32": T.F32, "f16": T.F16, "bf16": T.BF16, "q8_0": T.Q8_0}[name]


def run_pack(args):
    from ..export import packer
    from ..utils.logging import StageTimer

    if args.print_supported_models:
        from ..export.mmproj import MMPROJ_REGISTRY

        for mt in sorted(packer._ARCH_REGISTRY):
            print(mt)
        print("-- mmproj:")
        for mt in sorted(MMPROJ_REGISTRY):
            print(mt)
        return
    if not args.model_dir or not args.outfile:
        raise SystemExit("--model_dir and --outfile are required")
    timer = StageTimer()
    if args.mmproj:
        from ..export import mmproj

        with timer.stage("pack-mmproj"):
            out = mmproj.pack_mmproj(
                args.model_dir, args.outfile,
                use_f32=(args.outtype or args.outtype_fallback) == "f32")
        print(f"wrote {out}")
        return
    if args.quant_dir is None and not args.vocab_only:
        raise SystemExit("--quant_dir is required unless --mmproj or "
                         "--vocab-only is given")
    extra = {}
    if args.metadata:
        with open(args.metadata) as f:
            extra.update(json.load(f))
    if args.model_name:
        extra["general.name"] = args.model_name
    with timer.stage("pack"):
        out = packer.pack_model(
            args.model_dir, args.quant_dir or "/nonexistent", args.outfile,
            default_float=_resolve_outtype(args),
            extra_metadata=extra or None, vocab_only=args.vocab_only)
    if args.split_max_tensors or args.split_max_size:
        import os

        from ..mapper import shards

        max_size = 0
        if args.split_max_size:
            m = {"K": 1 << 10, "M": 1 << 20, "G": 1 << 30}
            sfx = args.split_max_size[-1].upper()
            max_size = (int(args.split_max_size[:-1]) * m[sfx]
                        if sfx in m else int(args.split_max_size))
        prefix = str(out)[:-5] if str(out).endswith(".gguf") else str(out)
        with timer.stage("shard"):
            parts = shards.split_gguf_file(
                out, prefix, max_tensors=args.split_max_tensors,
                max_size=max_size,
                no_tensor_first_split=args.no_tensor_first_split)
        os.unlink(out)
        for p_ in parts:
            print(f"wrote {p_}")
        return
    print(f"wrote {out}")


# -- split (gguf_splitter.py) ----------------------------------------------


def build_split(p: argparse.ArgumentParser):
    p.add_argument("--gguf-file", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--gguf-layers", action="store_true", help="raw GGML layout")
    p.add_argument("--hf-layers", action="store_true", help="dequantized HF layout")
    p.add_argument("--exact", action="store_true", default=True)
    p.add_argument("--bitwidth", default=None, help="overwrite quant type tag")
    p.add_argument("--list-bitwidths", action="store_true")


def run_split(args):
    from ..mapper import splitter

    if args.list_bitwidths:
        for layer, bws in splitter.list_bitwidths(args.output_dir).items():
            print(f"{layer}: {bws}")
        return
    if args.hf_layers:
        splitter.split_hf(args.gguf_file, args.output_dir, exact=args.exact,
                          overwrite_bitwidth=args.bitwidth)
    else:
        splitter.split_gguf(args.gguf_file, args.output_dir, exact=args.exact,
                            overwrite_bitwidth=args.bitwidth)


# -- stitch (gguf_stitcher.py) ---------------------------------------------


def build_stitch(p: argparse.ArgumentParser):
    p.add_argument("--split-dir", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--output", default=None)
    p.add_argument("--default-bitwidth", type=float, default=4.5)
    p.add_argument("--default-quant-type", default="Q4_K")
    p.add_argument("--validate-only", action="store_true")
    p.add_argument("--list-tensors", action="store_true")
    p.add_argument("--inspect-metadata", action="store_true")


def run_stitch(args):
    from ..mapper.stitcher import GGUFStitcher

    st = GGUFStitcher(args.split_dir, args.config, args.default_bitwidth, args.default_quant_type)
    if args.validate_only:
        problems = st.validate()
        if problems:
            print("\n".join(problems))
            sys.exit(1)
        print("configuration valid")
        return
    if args.list_tensors:
        for name, info in st.list_tensors().items():
            print(f"{name}: {info}")
        return
    if args.inspect_metadata:
        print(json.dumps(st.manifest.get("metadata", {}), indent=2, default=str))
        return
    if not args.output:
        sys.exit("--output required")
    out = st.stitch(args.output)
    print(f"wrote {out}")


# -- convert-config (config_converter.py) ----------------------------------


def build_convert_config(p: argparse.ArgumentParser):
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--missing-value", default="32")
    p.add_argument("--moe", action="store_true", default=None)


def run_convert_config(args):
    from ..mapper import config_converter

    cfg = config_converter.convert_file(args.input, args.output, args.missing_value, args.moe)
    print(f"wrote {len(cfg)} entries to {args.output}")


# -- build-db (build_ep_database.sh) ---------------------------------------


def build_build_db(p: argparse.ArgumentParser):
    p.add_argument("--models", nargs="+", required=True, help=".gguf files")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--copy-models", action="store_true")
    p.add_argument("--skip-hf", action="store_true")


def run_build_db(args):
    from ..mapper import db_builder

    db_builder.build_ep_database(
        args.models, args.output_dir, copy_models=args.copy_models, skip_hf=args.skip_hf
    )


# -- ppl (eval/ppleval.py) --------------------------------------------------


def build_ppl(p: argparse.ArgumentParser):
    common.add_model_args(p, required=False)
    p.add_argument("--gguf-file", default=None,
                   help="evaluate a GGUF directly (dequantized through the "
                        "serving loader; tokenizes with the GGUF's own "
                        "vocab — the llama-perplexity flow)")
    p.add_argument("--datasets", nargs="+", default=["synthetic"])
    p.add_argument("--sequence_length", type=int, default=None)
    p.add_argument("--eval_tokens", type=int, default=2**17)
    p.add_argument("--compressed_weights_path", default=None)
    p.add_argument("--compressed_config_path", default=None)
    p.add_argument("--default_level", default="0")
    p.add_argument("--drop_layer_config", default=None)
    p.add_argument("--memory_efficient", action="store_true",
                   help="layer-per-layer eval (metrics.py:122-192)")
    p.add_argument("--gguf-path", default="auto",
                   choices=["auto", "dense", "serving"],
                   help="GGUF scoring path: 'dense' dequantizes every "
                        "weight to f32 (bit-matched oracle; needs the full "
                        "dense model in HBM), 'serving' scores through the "
                        "fused dequant kernels with weights kept packed "
                        "(how 8B+ GGUFs fit one chip); 'auto' picks dense "
                        "below ~2 GB of f32 weights")
    p.add_argument("--output_path", default=None)


def run_ppl(args):
    from ..evals import compress, ppl
    from ..utils.data import get_data

    serving_path = False
    if args.gguf_file:
        import jax.numpy as jnp
        import numpy as np

        from ..serving import model as qmodel

        mode = args.gguf_path
        if mode == "auto":
            from ..formats.gguf import GGUFReader

            n_el = sum(int(np.prod(i.shape))
                       for i in GGUFReader(args.gguf_file).tensors.values())
            mode = "dense" if n_el * 4 < 2e9 else "serving"
        serving_path = mode == "serving"
        params, cfg = qmodel.load_gguf_for_serving(
            args.gguf_file, dtype=common.resolve_dtype(args.dtype),
            dense=not serving_path)
        if args.tokenizer_name or args.model_name_or_path:
            tokenizer = common.load_tokenizer(args)
        else:
            from ..formats.gguf import GGUFReader
            from ..serving import tokenizer as gtok

            gg = gtok.from_gguf(GGUFReader(args.gguf_file))
            if gg is None:
                tokenizer = None
            else:
                class _Wrap:
                    def __call__(self, text):
                        return {"input_ids": gg.encode(text)}

                    def decode(self, ids):
                        return gg.decode(ids)

                tokenizer = _Wrap()
    else:
        if not args.model_name_or_path:
            raise SystemExit("need --model_name_or_path or --gguf-file")
        cfg, params = common.load_model(args)
        tokenizer = common.load_tokenizer(args)
    if args.drop_layer_config:
        params = compress.apply_layer_drops(
            params, compress.load_drop_config(args.drop_layer_config)
        )
    if args.compressed_weights_path:
        params = compress.load_compressed_weights(
            params, args.compressed_weights_path, args.compressed_config_path,
            args.default_level,
        )
    seq = args.sequence_length or min(cfg.max_position_embeddings, 4096)
    results = {}
    if serving_path:
        if args.memory_efficient or args.drop_layer_config or \
                args.compressed_weights_path:
            raise SystemExit(
                "--gguf-path serving scores packed weights directly; it "
                "cannot combine with --memory_efficient / layer drops / "
                "compressed weights (use --gguf-path dense)")
        fn = functools.partial(ppl.compute_perplexity, serving=True)
    else:
        fn = (ppl.compute_perplexity_layer_per_layer
              if args.memory_efficient else ppl.compute_perplexity)
    for name in args.datasets:
        data = get_data(name, args.eval_tokens, seq, tokenizer, train=False,
                        vocab_size=cfg.vocab_size)
        results[name] = fn(params, cfg, data)
        print(f"{name} perplexity: {results[name]:.3f}")
    if args.output_path:
        with open(args.output_path, "w") as f:
            json.dump(results, f, indent=2)


# -- search (evo_quant_search.py) ------------------------------------------


def build_search(p: argparse.ArgumentParser):
    common.add_model_args(p)
    common.add_data_args(p)
    common.add_mesh_args(p)
    p.add_argument("--quant_weights_path", required=True, help="HF-layout DB")
    p.add_argument("--target_bitwidth", type=float, required=True)
    p.add_argument("--generations", type=int, default=50)
    p.add_argument("--offspring", type=int, default=128)
    p.add_argument("--survivors_per_selection", type=int, nargs="+", default=[16, 4, 1])
    p.add_argument("--tokens_per_selection", type=int, nargs="+", default=[2048, 16384, 131072])
    p.add_argument("--fitness_fn", default="kl", choices=["ppl", "kl", "sparse_kl"])
    p.add_argument("--group_rule", default="size", choices=["none", "name", "size"])
    p.add_argument("--initially_generated", type=int, default=64)
    p.add_argument("--initial_tokens", type=int, default=16384)
    p.add_argument("--kl_topk", type=int, default=64)
    p.add_argument("--eval_every", type=int, default=10)
    p.add_argument("--eval_datasets", nargs="+", default=None,
                   help="datasets for the periodic ppl eval (evo_quant_search.py:498-505)")
    p.add_argument("--eval_tokens", type=int, default=2**17)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--wandb", action="store_true",
                   help="log per-generation fitness to wandb (reference evo_quant_search.py:321)")
    p.add_argument("--checkpoint_path", default=None)


def run_search(args):
    import os

    import numpy as np

    from ..search import evopress

    cfg, params = common.load_model(args)
    tokenizer = common.load_tokenizer(args)
    calib = common.load_calibration(args, cfg, tokenizer)
    model = evopress.SearchModel(params, cfg, args.quant_weights_path)

    target_logits = None
    if args.fitness_fn in ("kl", "sparse_kl"):
        if args.fitness_fn == "kl":
            est = sum(np.atleast_2d(np.asarray(c)).size for c in calib) * cfg.vocab_size * 4
            if est > 8e9:
                print(
                    f"[search] WARNING: dense KL teacher cache needs ~{est/1e9:.0f} GB "
                    "of host memory (seqs x vocab f32); consider --fitness_fn sparse_kl"
                )
        target_logits = evopress.compute_target_logits(
            model, calib, args.fitness_fn, topk=args.kl_topk
        )

    ecfg = evopress.EvoPressConfig(
        target_bitwidth=args.target_bitwidth,
        generations=args.generations,
        offspring=args.offspring,
        survivors_per_selection=tuple(args.survivors_per_selection),
        tokens_per_selection=tuple(args.tokens_per_selection),
        fitness_fn=args.fitness_fn,
        group_rule=args.group_rule,
        initially_generated=args.initially_generated,
        initial_tokens=args.initial_tokens,
        kl_topk=args.kl_topk,
        eval_every=args.eval_every,
        seed=args.seed,
        checkpoint_path=args.checkpoint_path,
    )
    eval_datasets = None
    if args.eval_datasets:
        from ..utils.data import get_data

        seq = calib[0].shape[-1]
        eval_datasets = {
            name: get_data(name, args.eval_tokens, seq, tokenizer, train=False,
                           vocab_size=cfg.vocab_size)
            for name in args.eval_datasets
        }

    mesh = common.make_mesh_from_args(args)
    from ..utils.logging import WandbLogger

    wandb_log = WandbLogger(enabled=args.wandb, project="gptq_gguf_tpu-search",
                            config=vars(args))

    def log_line(msg: str) -> None:
        print(msg)
        if "fitness" in msg and wandb_log.run is not None:
            wandb_log.log({"search/log": msg})

    best, groups, available = evopress.evo_press_search(
        model, calib, ecfg, target_logits=target_logits,
        eval_datasets=eval_datasets, mesh=mesh, log=log_line,
    )
    out = os.path.join(
        args.quant_weights_path,
        f"evo-{args.fitness_fn}-configuration-{args.target_bitwidth}.txt",
    )
    evopress.write_config(out, groups, best, available)
    print(f"wrote {out}")


# -- serve ------------------------------------------------------------------


def build_serve(p: argparse.ArgumentParser):
    p.add_argument("--gguf-file", required=True)
    p.add_argument("--prompt-tokens", type=int, nargs="+", default=None,
                   help="token ids (no tokenizer needed)")
    p.add_argument("--prompt", default=None,
                   help="text prompt, tokenized with the GGUF's own vocab "
                        "(tokenizer.ggml.* metadata, like llama.cpp)")
    p.add_argument("--draft-gguf", default=None,
                   help="draft model for greedy speculative decoding "
                        "(llama-speculative equivalent; output is identical "
                        "to plain greedy)")
    p.add_argument("--draft-k", type=int, default=4,
                   help="draft tokens proposed per verification step")
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--benchmark", action="store_true",
                   help="measure decode throughput on this GGUF: fill all "
                        "slots, run timed decode steps, print one JSON line")
    p.add_argument("--benchmark-steps", type=int, default=32)
    p.add_argument("--benchmark-prompt-len", type=int, default=64)
    p.add_argument("--num-slots", type=int, default=8)
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--kv-quantized", action="store_true",
                   help="int8 KV cache (halves KV memory/traffic)")
    p.add_argument("--kv-dtype", default=None,
                   choices=["bf16", "int8", "int4"],
                   help="KV cache dtype (int4: packed codes + group scales, "
                        "3.2x less KV memory/traffic); overrides "
                        "--kv-quantized")
    p.add_argument("--multi-step", default="auto",
                   type=lambda s: s if s == "auto" else int(s),
                   help="decode in k-step scan blocks: one program dispatch "
                        "per k tokens instead of per token, at up to k steps "
                        "of added streaming latency. 'auto' (default) picks "
                        "the largest power of two <=64 that fits remaining "
                        "budgets/cache and drops to <=8 while requests are "
                        "queued; pass 1 to force per-token decode (needed "
                        "for per-token streaming)")
    p.add_argument("--paged", action="store_true",
                   help="block-table paged KV cache")
    p.add_argument("--page-size", type=int, default=64)
    p.add_argument("--http", action="store_true", help="run the HTTP server loop")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer dir for text prompts over HTTP")
    p.add_argument("--profile-dir", dest="profile_dir", default=None,
                   help="write a jax.profiler trace here (TensorBoard/xprof)")
    p.add_argument("--mmproj", default=None,
                   help="mmproj GGUF (vision tower) for --image prompts")
    p.add_argument("--image", default=None,
                   help="image file; its soft tokens are spliced in front "
                        "of the prompt (llama.cpp mtmd equivalent)")
    p.add_argument("--image-token-id", type=int, default=None,
                   help="decoder vocab id reserved for image soft tokens "
                        "(default: looked up from the GGUF tokenizer)")
    p.add_argument("--audio", default=None,
                   help="audio file (16 kHz mono PCM16 .wav, or a .npy of "
                        "precomputed log-mel features); soft tokens are "
                        "spliced in front of the prompt")
    p.add_argument("--audio-token-id", type=int, default=None,
                   help="decoder vocab id reserved for audio soft tokens")


def run_serve(args):
    import time

    import numpy as np

    from ..serving import engine, model as qmodel
    from ..utils.logging import StageTimer, profile_trace

    timer = StageTimer()
    with timer.stage("load_gguf"):
        params, cfg = qmodel.load_gguf_for_serving(args.gguf_file)
        params = qmodel.fuse_params_for_serving(params, cfg)

    if args.http:
        from ..serving.server import serve_http

        tokenizer = None
        eos_id = None
        gg = None
        if args.tokenizer:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
            eos_id = tokenizer.eos_token_id
        else:  # fall back to the GGUF's own vocab (llama.cpp behavior)
            from ..formats.gguf import GGUFReader
            from ..serving import tokenizer as gtok

            gg = gtok.from_gguf(GGUFReader(args.gguf_file))
            if gg is not None:
                eos_id = gg.eos_id

                class _Wrap:  # match the HF callable/decodable shape
                    def __call__(self, text):
                        return {"input_ids": gg.encode(text)}

                    def decode(self, ids):
                        return gg.decode(ids)

                if gg.chat_template:
                    _Wrap.apply_chat_template = staticmethod(
                        gg.apply_chat_template)
                tokenizer = _Wrap()
        imager = None
        if args.mmproj:
            import io

            import jax.numpy as jnp
            from PIL import Image

            from ..formats.gguf import GGUFReader

            img_tok = args.image_token_id
            if img_tok is None and gg is not None:
                for cand in ("<start_of_image>", "<image_soft_token>",
                             "<image>", "<|image_pad|>"):
                    if cand in gg.vocab:
                        img_tok = gg.vocab[cand]
                        break
            if img_tok is None:
                raise SystemExit("--mmproj over HTTP needs --image-token-id "
                                 "(or an image token in the GGUF vocab)")
            proj_type = GGUFReader(args.mmproj).get("clip.projector_type")
            if proj_type in ("qwen2vl_merger", "qwen2.5vl_merger"):
                from transformers import Qwen2VLImageProcessor

                from ..serving import qwen_vl

                qvp, qvcfg = qwen_vl.load_mmproj_qwen_gguf(args.mmproj)
                proc = Qwen2VLImageProcessor(
                    patch_size=qvcfg.patch_size,
                    temporal_patch_size=qvcfg.temporal_patch_size,
                    merge_size=qvcfg.spatial_merge_size)
                s2 = qvcfg.spatial_merge_size ** 2

                def imager(blobs):
                    softs, grids = [], []
                    for b in blobs:
                        feats = proc(Image.open(io.BytesIO(b)).convert("RGB"),
                                     return_tensors="np")
                        _, gh, gw = feats["image_grid_thw"][0].tolist()
                        softs.append(np.asarray(qwen_vl.encode_patches(
                            qvp, qvcfg,
                            feats["pixel_values"].astype(np.float32),
                            (gh, gw))))
                        grids.append((gh // qvcfg.spatial_merge_size,
                                      gw // qvcfg.spatial_merge_size))

                    def pos_fn(prompt_ids):
                        return qwen_vl.qwen2vl_positions(
                            prompt_ids, int(img_tok), grids)

                    return (np.concatenate(softs, axis=0), int(img_tok),
                            pos_fn)
            else:
                from ..serving import vlm as vlm_mod

                vp, vcfg = vlm_mod.load_mmproj_gguf(args.mmproj)

                def imager(blobs):
                    pix = []
                    for b in blobs:
                        im = Image.open(io.BytesIO(b)).convert("RGB").resize(
                            (vcfg.image_size, vcfg.image_size), Image.BILINEAR)
                        x = np.asarray(im, np.float32) / 255.0
                        x = ((x - np.asarray(vcfg.image_mean))
                             / np.asarray(vcfg.image_std))
                        pix.append(x.transpose(2, 0, 1))
                    soft = vlm_mod.image_soft_tokens(
                        vp, vcfg, jnp.asarray(np.stack(pix)))
                    return (np.asarray(soft).reshape(-1, soft.shape[-1]),
                            int(img_tok), None,
                            vcfg.projector == "gemma3")
        if args.paged:
            eng = engine.PagedContinuousBatchingEngine(
                params, cfg, num_slots=args.num_slots, max_len=args.max_len,
                page_size=args.page_size, eos_token_id=eos_id,
            )
        else:
            eng = engine.ContinuousBatchingEngine(
                params, cfg, num_slots=args.num_slots, max_len=args.max_len,
                kv_quantized=args.kv_dtype or args.kv_quantized,
                eos_token_id=eos_id, multi_step=args.multi_step,
            )
        serve_http(eng, host=args.host, port=args.port, tokenizer=tokenizer,
                   imager=imager)
        return

    if args.benchmark:
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        B, P = args.num_slots, args.benchmark_prompt_len
        cache = qmodel.init_cache(cfg, B, args.max_len,
                                  dtype=jnp.bfloat16,
                                  kv_dtype=args.kv_dtype or
                                  ("int8" if args.kv_quantized else None))
        prompt = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (1, P)).astype(np.int32))
        t0 = time.time()
        for slot in range(B):
            tok, _, cache = engine._prefill_slot(
                params, cfg, prompt, cache, slot)
            np.asarray(tok)
        prefill_s = time.time() - t0
        tokens = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (B,)).astype(np.int32))
        for _ in range(4):  # compile + warmup
            tokens, _, cache = engine._decode_step(params, cfg, tokens, cache)
            np.asarray(tokens)
        t0 = time.time()
        for _ in range(args.benchmark_steps):
            tokens, _, cache = engine._decode_step(params, cfg, tokens, cache)
            np.asarray(tokens)  # host readback forces execution
        dt = (time.time() - t0) / args.benchmark_steps
        print(json.dumps({
            "tokens_per_s": round(B / dt, 2),
            "ms_per_step": round(dt * 1e3, 3),
            "batch": B, "prompt_len": P, "max_len": args.max_len,
            "prefill_s_total": round(prefill_s, 2),
            "kv_dtype": args.kv_dtype or ("int8" if args.kv_quantized else "bf16"),
        }))
        return

    gg = None
    if args.prompt_tokens is not None:
        prompt = np.asarray(args.prompt_tokens, dtype=np.int64)
    elif args.prompt is not None:
        from ..formats.gguf import GGUFReader
        from ..serving import tokenizer as gtok

        gg = gtok.from_gguf(GGUFReader(args.gguf_file))
        if gg is None:
            raise SystemExit(
                "--prompt needs a GGUF with tokenizer.ggml.* metadata; "
                "use --prompt-tokens for vocab-less files")
        prompt = np.asarray(gg.encode(args.prompt), dtype=np.int64)
        if prompt.size == 0:
            raise SystemExit(
                "--prompt tokenized to 0 tokens with this GGUF's vocab "
                "(out-of-vocab text and no byte-fallback tokens); pass "
                "--prompt-tokens instead")
    else:
        prompt = np.asarray([1, 2, 3, 4], dtype=np.int64)
    if args.audio:
        from ..serving import audio as audio_mod

        if not args.mmproj:
            raise SystemExit("--audio needs --mmproj <audio-tower.gguf>")
        with timer.stage("load_mmproj"):
            ap, acfg = audio_mod.load_mmproj_audio_gguf(args.mmproj)
        aud_tok = args.audio_token_id
        if aud_tok is None:
            if gg is None:
                from ..formats.gguf import GGUFReader
                from ..serving import tokenizer as gtok

                gg = gtok.from_gguf(GGUFReader(args.gguf_file))
            for cand in ("<|AUDIO|>", "<audio>", "<|audio_pad|>"):
                if gg is not None and cand in gg.vocab:
                    aud_tok = gg.vocab[cand]
                    break
            if aud_tok is None:
                raise SystemExit("pass --audio-token-id (no audio token "
                                 "found in the GGUF vocab)")
        if args.audio.endswith(".npy"):
            mel = np.load(args.audio)
        else:
            import wave

            with wave.open(args.audio) as w:
                assert w.getnchannels() == 1 and w.getsampwidth() == 2, \
                    "expect 16 kHz mono PCM16 .wav"
                pcm = np.frombuffer(w.readframes(w.getnframes()),
                                    np.int16).astype(np.float32) / 32768.0
            from transformers import WhisperFeatureExtractor

            fe = WhisperFeatureExtractor(feature_size=acfg.num_mel_bins)
            mel = fe(pcm, sampling_rate=16000,
                     return_tensors="np")["input_features"]
        if mel.ndim == 2:
            mel = mel[None]
        n_soft = mel.shape[-1] // 4  # conv2 stride 2 then x2 pool
        ids = np.concatenate([
            np.full((n_soft,), aud_tok, np.int64), prompt])
        with profile_trace(args.profile_dir), timer.stage("generate"):
            t0 = time.time()
            out = audio_mod.generate_with_audio(
                params, cfg, ap, acfg, ids, mel.astype(np.float32),
                int(aud_tok), max_new_tokens=args.max_new_tokens)
            dt = time.time() - t0
        print(f"generated {len(out)} tokens in {dt:.2f}s "
              f"({len(out) / dt:.1f} tok/s)")
        print(out)
        if gg is not None:
            print(repr(gg.decode(out)))
        return
    if args.image:
        from ..formats.gguf import GGUFReader
        from ..serving import vlm

        if not args.mmproj:
            raise SystemExit("--image needs --mmproj <vision-tower.gguf>")
        img_tok = args.image_token_id
        if img_tok is None:
            if gg is None:
                from ..serving import tokenizer as gtok

                gg = gtok.from_gguf(GGUFReader(args.gguf_file))
            for cand in ("<start_of_image>", "<image_soft_token>", "<image>",
                         "<|image_pad|>"):
                if gg is not None and cand in gg.vocab:
                    img_tok = gg.vocab[cand]
                    break
            if img_tok is None:
                raise SystemExit("pass --image-token-id (no image token "
                                 "found in the GGUF vocab)")
        mm_proj_type = GGUFReader(args.mmproj).get("clip.projector_type")
        if mm_proj_type in ("qwen2vl_merger",):
            from transformers import Qwen2VLImageProcessor

            from ..serving import qwen_vl

            with timer.stage("load_mmproj"):
                qvp, qvcfg = qwen_vl.load_mmproj_qwen_gguf(args.mmproj)
            proc = Qwen2VLImageProcessor(
                patch_size=qvcfg.patch_size,
                temporal_patch_size=qvcfg.temporal_patch_size,
                merge_size=qvcfg.spatial_merge_size)
            from PIL import Image

            feats = proc(Image.open(args.image).convert("RGB"),
                         return_tensors="np")
            patches = feats["pixel_values"].astype(np.float32)
            _, gh, gw = feats["image_grid_thw"][0].tolist()
            n_soft = (gh * gw) // (qvcfg.spatial_merge_size ** 2)
            ids = np.concatenate([
                np.full((n_soft,), img_tok, np.int64), prompt])
            with profile_trace(args.profile_dir), timer.stage("generate"):
                t0 = time.time()
                out = qwen_vl.generate_with_images(
                    params, cfg, qvp, qvcfg, ids, patches, (gh, gw),
                    int(img_tok), max_new_tokens=args.max_new_tokens)
                dt = time.time() - t0
            print(f"generated {len(out)} tokens in {dt:.2f}s "
                  f"({len(out) / dt:.1f} tok/s)")
            print(out)
            if gg is not None:
                print(repr(gg.decode(out)))
            return
        with timer.stage("load_mmproj"):
            vp, vcfg = vlm.load_mmproj_gguf(args.mmproj)
        pixels = vlm.preprocess_image(args.image, vcfg)
        # splice the image in front of the text (llama.cpp mtmd default)
        ids = np.concatenate([
            np.full((vcfg.mm_tokens_per_image,), img_tok, np.int64), prompt])
        with profile_trace(args.profile_dir), timer.stage("generate"):
            t0 = time.time()
            out = vlm.generate_with_images(
                params, cfg, vp, vcfg, ids, pixels, int(img_tok),
                max_new_tokens=args.max_new_tokens)
            dt = time.time() - t0
        print(f"generated {len(out)} tokens in {dt:.2f}s "
              f"({len(out) / dt:.1f} tok/s)")
        print(out)
        if gg is not None:
            print(repr(gg.decode(out)))
        return
    with profile_trace(args.profile_dir), timer.stage("generate"):
        t0 = time.time()
        if args.draft_gguf:
            from ..serving import spec_decode

            with timer.stage("load_draft"):
                d_params, d_cfg = qmodel.load_gguf_for_serving(args.draft_gguf)
                d_params = qmodel.fuse_params_for_serving(d_params, d_cfg)
            stats = {}
            out = spec_decode.generate_speculative(
                params, cfg, d_params, d_cfg, [prompt],
                max_new_tokens=args.max_new_tokens, draft_k=args.draft_k,
                collect_stats=stats)[0]
            if stats.get("proposed"):
                print(f"draft acceptance: {stats['accepted']}/{stats['proposed']} "
                      f"({stats['accepted'] / stats['proposed']:.0%})")
        else:
            out = engine.generate(params, cfg, [prompt],
                                  max_new_tokens=args.max_new_tokens)[0]
        dt = time.time() - t0
    print(f"generated {len(out)} tokens in {dt:.2f}s ({len(out) / dt:.1f} tok/s)")
    print(out)
    if gg is not None:
        print(repr(gg.decode(out)))


def build_gguf_split(p: argparse.ArgumentParser):
    p.add_argument("--input", required=True, help="source .gguf (or first shard for --merge)")
    p.add_argument("--output", required=True,
                   help="shard prefix (split) or output .gguf (merge)")
    p.add_argument("--split-max-tensors", type=int, default=0)
    p.add_argument("--split-max-size", default=None,
                   help="e.g. 500M or 2G (approximate, tensor payloads)")
    p.add_argument("--no-tensor-first-split", action="store_true",
                   help="first shard carries metadata only")
    p.add_argument("--merge", action="store_true",
                   help="reassemble a shard set into one file")


def run_gguf_split(args):
    from ..mapper import shards

    if args.merge:
        out = shards.merge_gguf_files(args.input, args.output)
        print(f"wrote {out}")
        return
    max_size = 0
    if args.split_max_size:
        m = {"K": 1 << 10, "M": 1 << 20, "G": 1 << 30}
        suffix = args.split_max_size[-1].upper()
        max_size = (int(args.split_max_size[:-1]) * m[suffix]
                    if suffix in m else int(args.split_max_size))
    out = shards.split_gguf_file(
        args.input, args.output, max_tensors=args.split_max_tensors,
        max_size=max_size,
        no_tensor_first_split=args.no_tensor_first_split)
    for o in out:
        print(f"wrote {o}")


SUBCOMMANDS = {
    "pack": (build_pack, run_pack),
    "split": (build_split, run_split),
    "stitch": (build_stitch, run_stitch),
    "convert-config": (build_convert_config, run_convert_config),
    "build-db": (build_build_db, run_build_db),
    "ppl": (build_ppl, run_ppl),
    "search": (build_search, run_search),
    "serve": (build_serve, run_serve),
    "gguf-split": (build_gguf_split, run_gguf_split),
}


# -- rtn-quantize (llama-quantize equivalent, quant/gguf/run_quant.sh) ------


def build_rtn(p: argparse.ArgumentParser):
    common.add_model_args(p)
    common.add_data_args(p)
    p.add_argument("--quant_type", default="Q4_K",
                   choices=["Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K"])
    p.add_argument("--imatrix", action="store_true",
                   help="importance-weighted scale fitting from a calibration pass")
    p.add_argument("--pure", action="store_true",
                   help="quantize embeddings/head at the same type too")
    p.add_argument("--save_dir", required=True)
    p.add_argument("--outfile", default=None, help="optionally pack to .gguf")
    p.add_argument("--summary", default=None, help="quantization_summary.json path")
    p.add_argument("--batch_size", type=int, default=1)


def run_rtn(args):
    from ..quant import rtn

    cfg, params = common.load_model(args)
    imatrix = None
    if args.imatrix:
        tokenizer = common.load_tokenizer(args)
        calib = common.load_calibration(args, cfg, tokenizer)
        imatrix = rtn.compute_imatrix(params, cfg, calib, batch_size=args.batch_size)
    qt = args.quant_type
    qmap = {k: qt for k in ("q_proj", "k_proj", "v_proj", "o_proj",
                            "gate_proj", "up_proj", "down_proj")}
    if args.pure:
        qmap["embed_tokens"] = qt
        qmap["lm_head"] = qt
    rtn.rtn_quantize_model(
        params, cfg, qmap, args.save_dir, imatrix=imatrix,
        quant_non_block=args.pure,
    )
    if args.outfile:
        from ..export import packer

        packer.pack_model(args.model_name_or_path, args.save_dir, args.outfile)
        if args.summary:
            rtn.quantization_summary(args.outfile, args.summary)
        print(f"wrote {args.outfile}")


SUBCOMMANDS["rtn-quantize"] = (build_rtn, run_rtn)


# -- pack-compressed (pack_compressed_tensors_into_gguf.py) -----------------


def build_pack_compressed(p: argparse.ArgumentParser):
    p.add_argument("--model_dir", required=True, help="compressed-tensors HF checkpoint")
    p.add_argument("--quant_dir", default=None,
                   help="safetensors with *.weight_packed (default: model_dir)")
    p.add_argument("--outfile", required=True)


def run_pack_compressed(args):
    from ..export import compressed_tensors

    out = compressed_tensors.pack_compressed_tensors_model(
        args.model_dir, args.outfile, args.quant_dir
    )
    print(f"wrote {out}")


SUBCOMMANDS["pack-compressed"] = (build_pack_compressed, run_pack_compressed)


# -- imatrix (llama.cpp llama-imatrix equivalent) ---------------------------


def build_imatrix(p: argparse.ArgumentParser):
    common.add_model_args(p)
    common.add_data_args(p)
    p.add_argument("--output", required=True,
                   help=".npz of importance vectors, or a llama.cpp-format "
                        "binary when the name ends in .imatrix")
    p.add_argument("--batch_size", type=int, default=1)


def run_imatrix(args):
    import numpy as np

    from ..export.packer import hf_to_gguf_name
    from ..quant import rtn

    cfg, params = common.load_model(args)
    tokenizer = common.load_tokenizer(args)
    calib = common.load_calibration(args, cfg, tokenizer)
    im = rtn.compute_imatrix(params, cfg, calib, batch_size=args.batch_size)
    out = {}
    for hf_name, vec in im.items():
        out[hf_name] = np.asarray(vec, np.float32)
        gguf_name = hf_to_gguf_name(hf_name + ".weight")
        if gguf_name:
            out[gguf_name] = out[hf_name]
    if str(args.output).endswith(".imatrix"):
        from ..quant.imatrix_io import save_imatrix

        gguf_only = {k: v for k, v in out.items() if k.startswith(("blk.", "output", "token_embd"))}
        save_imatrix(gguf_only, args.output,
                     dataset=str(args.calibration_data))
        print(f"wrote {len(gguf_only)} importance vectors "
              f"(llama.cpp .imatrix) to {args.output}")
    else:
        np.savez(args.output, **out)
        print(f"wrote {len(im)} importance vectors (hf + gguf keys) to {args.output}")


SUBCOMMANDS["imatrix"] = (build_imatrix, run_imatrix)


# -- llama-quantize (GGUF -> GGUF mixed-type recipes, run_quant.sh) ---------


def build_llama_quantize(p: argparse.ArgumentParser):
    from ..quant.recipes import FTYPE_IDS

    p.add_argument("--input", required=True, help="source .gguf (typically F16)")
    p.add_argument("--output", required=True)
    p.add_argument("--ftype", required=True, choices=sorted(FTYPE_IDS),
                   help="recipe, e.g. Q4_K_M / IQ4_XS")
    p.add_argument("--imatrix", default=None,
                   help=".npz or llama.cpp .imatrix of per-tensor "
                        "importance vectors (GGUF tensor names)")
    p.add_argument("--pure", action="store_true",
                   help="base type for every tensor (llama-quantize --pure)")
    p.add_argument("--summary", default=None, help="quantization_summary.json path")
    p.add_argument("--verbose", action="store_true")


def run_llama_quantize(args):
    import numpy as np

    from ..quant import recipes, rtn

    imatrix = None
    if args.imatrix:
        if str(args.imatrix).endswith(".imatrix"):
            from ..quant.imatrix_io import load_imatrix

            imatrix, _, _ = load_imatrix(args.imatrix)
        else:
            with np.load(args.imatrix) as z:
                imatrix = {k: z[k] for k in z.files}
    progress = (lambda name, t: print(f"{name} -> {t}")) if args.verbose else None
    out = recipes.llama_quantize(
        args.input, args.output, args.ftype,
        imatrix=imatrix, pure=args.pure, progress=progress,
    )
    summary = rtn.quantization_summary(out, args.summary)
    print(f"wrote {out} ({summary['bits_per_weight']:.3f} bpw)")


SUBCOMMANDS["llama-quantize"] = (build_llama_quantize, run_llama_quantize)


# -- lm-eval (eval/lmeval.py) ----------------------------------------------


def build_lmeval(p: argparse.ArgumentParser):
    common.add_model_args(p)
    p.add_argument("--tasks", nargs="+", required=True)
    p.add_argument("--num_fewshot", type=int, default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--compressed_weights_path", default=None)
    p.add_argument("--compressed_config_path", default=None)
    p.add_argument("--output_path", default=None)


def run_lmeval(args):
    from ..evals import compress, lmeval

    if not lmeval.HAS_LM_EVAL:
        raise SystemExit("lm_eval is not installed (pip install lm-eval)")
    cfg, params = common.load_model(args)
    tokenizer = common.load_tokenizer(args)
    if args.compressed_weights_path:
        params = compress.load_compressed_weights(
            params, args.compressed_weights_path, args.compressed_config_path
        )
    results = lmeval.evaluate(
        params, cfg, tokenizer, args.tasks,
        num_fewshot=args.num_fewshot, batch_size=args.batch_size, limit=args.limit,
    )
    print(json.dumps(results.get("results", results), indent=2, default=str))
    if args.output_path:
        with open(args.output_path, "w") as f:
            json.dump(results, f, indent=2, default=str)


SUBCOMMANDS["lm-eval"] = (build_lmeval, run_lmeval)


# -- plan (serving HBM memory planner) --------------------------------------


def build_plan(p: argparse.ArgumentParser):
    p.add_argument("--model_name_or_path", default=None, help="HF checkpoint dir")
    p.add_argument("--preset", choices=["llama-3-8b", "llama-3-70b"], default=None)
    p.add_argument("--qtype", default="Q4_K",
                   choices=["Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-len", type=int, default=4096)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--chip", default="v5e", choices=["v5e", "v5p", "v4", "v6e"])
    p.add_argument("--kv-quantized", action="store_true")
    p.add_argument("--kv-dtype", default=None,
                   choices=["bf16", "int8", "int4"],
                   help="overrides --kv-quantized")


def run_plan(args):
    from ..formats.ggml import GGMLQuantizationType
    from ..serving import memory_plan as mp

    if args.preset:
        cfg = mp.LLAMA3_70B if args.preset == "llama-3-70b" else mp.LLAMA3_8B
    elif args.model_name_or_path:
        from ..models import loader

        cfg = loader.load_config(args.model_name_or_path)
    else:
        raise SystemExit("need --model_name_or_path or --preset")
    plan = mp.plan_serving_memory(
        cfg, qtype=GGMLQuantizationType[args.qtype], batch=args.batch,
        max_len=args.max_len, tp=args.tp, chip=args.chip,
        kv_quantized=args.kv_dtype or args.kv_quantized,
    )
    print(json.dumps(plan.summary(), indent=2))
    if not plan.fits:
        print(f"does NOT fit at tp={args.tp} on {args.chip}; try more chips")


SUBCOMMANDS["plan"] = (build_plan, run_plan)


# -- parity (BASELINE.md acceptance harness) --------------------------------


def build_parity(p: argparse.ArgumentParser):
    p.add_argument("--model_name_or_path", default=None,
                   help="local HF checkpoint; omit with --synthetic-shapes")
    p.add_argument("--synthetic-shapes", dest="synthetic_shapes", default=None,
                   choices=["llama-3.2-1b", "llama-3.1-8b", "tiny"],
                   help="fabricate a random checkpoint at real shapes (offline dry run)")
    p.add_argument("--bit_widths", nargs="+", default=["Q4_K"],
                   choices=["Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K"])
    p.add_argument("--calibration_data", default=None,
                   help="default: wikitext2 (synthetic under --synthetic-shapes)")
    p.add_argument("--calibration_tokens", type=int, default=2**19)
    p.add_argument("--sequence_length", type=int, default=None)
    p.add_argument("--eval_tokens", type=int, default=2**19)
    p.add_argument("--reference_name", default=None,
                   help="override reference-table row matching (e.g. llama-3.2-1b)")
    p.add_argument("--no-pack", dest="pack", action="store_false")
    p.add_argument("--out_dir", required=True)


def run_parity_cmd(args):
    from pathlib import Path

    from ..evals import parity

    model_dir = args.model_name_or_path
    if args.synthetic_shapes:
        model_dir = parity.make_synthetic_checkpoint(
            Path(args.out_dir) / "synthetic-checkpoint", args.synthetic_shapes
        )
        print(f"synthetic {args.synthetic_shapes} checkpoint at {model_dir}")
    if model_dir is None:
        raise SystemExit("need --model_name_or_path or --synthetic-shapes")
    calib = args.calibration_data or (
        "synthetic" if args.synthetic_shapes else "wikitext2"
    )
    results = parity.run_parity(
        model_dir, args.out_dir, args.bit_widths,
        calibration_data=calib,
        calibration_tokens=args.calibration_tokens,
        sequence_length=args.sequence_length,
        eval_tokens=args.eval_tokens,
        reference_name=args.reference_name or args.synthetic_shapes,
        pack=args.pack,
    )
    failed = [r for r in results if r.passed is False]
    if failed:
        raise SystemExit(f"{len(failed)} bit-width(s) exceed the "
                         f"{parity.PPL_TOLERANCE} ppl tolerance")


SUBCOMMANDS["parity"] = (build_parity, run_parity_cmd)


# -- estimate-errors (evopress/src/error_estimator.py) ----------------------


def build_estimate_errors(p: argparse.ArgumentParser):
    common.add_model_args(p)
    common.add_data_args(p)
    p.add_argument("--db_path", required=True, help="HF-layout multi-level DB")
    p.add_argument("--output_path", default=None)
    p.add_argument("--batch_size", type=int, default=1)


def run_estimate_errors(args):
    from ..search import ladder

    cfg, params = common.load_model(args)
    tokenizer = common.load_tokenizer(args)
    calib = common.load_calibration(args, cfg, tokenizer)
    res = ladder.estimate_layer_errors(
        params, cfg, calib, args.db_path,
        batch_size=args.batch_size, out_path=args.output_path,
    )
    for name, errs in res.items():
        best = min(errs, key=errs.get) if errs else None
        print(f"{name}: {len(errs)} levels, best {best}")


SUBCOMMANDS["estimate-errors"] = (build_estimate_errors, run_estimate_errors)


# -- embed (encoder GGUFs -> sentence embeddings; llama.cpp llama-embedding
# equivalent, OpenAI /v1/embeddings shape over --http) ----------------------


def build_embed(p: argparse.ArgumentParser):
    p.add_argument("--gguf-file", required=True,
                   help="bert-arch GGUF (this repo's packer output)")
    p.add_argument("--lora", default=None,
                   help="LoRA adapter GGUF to merge (jina-v3 task adapters)")
    p.add_argument("--prompt", nargs="+", default=None)
    p.add_argument("--input-file", default=None, help="one text per line")
    p.add_argument("--no-normalize", action="store_true",
                   help="skip L2 normalization")
    p.add_argument("--json-out", default=None, help="write vectors to a file")
    p.add_argument("--http", action="store_true",
                   help="serve POST /v1/embeddings instead")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)


def make_embedder(gguf_file, normalize=True, lora=None):
    """(texts) -> (vectors, token_count) over a bert-arch GGUF, optionally
    with a LoRA adapter GGUF merged (jina-v3 task adapters). The adapter's
    prompt prefix, if any, is prepended to every input (reference
    task_instructions semantics)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..formats.gguf import GGUFReader
    from ..models import bert
    from ..serving import tokenizer as gtok

    params, cfg = bert.load_gguf_encoder(gguf_file)
    prefix = ""
    if lora:
        params = bert.apply_lora_gguf(params, cfg, lora)
        prefix = GGUFReader(lora).get("adapter.lora.prompt_prefix", "") or ""
    gg = gtok.from_gguf(GGUFReader(gguf_file))
    if gg is None:
        raise ValueError(f"{gguf_file} carries no tokenizer.ggml vocab")
    cls_id = gg.vocab.get("[CLS]")
    sep_id = gg.vocab.get("[SEP]")

    fwd = jax.jit(bert.pooled_embedding,
                  static_argnames=("cfg", "normalize"))

    @functools.lru_cache(maxsize=None)
    def _bucket(n):
        b = 16
        while b < n:
            b *= 2
        return b

    def embed(texts):
        idss = []
        for t in texts:
            ids = gg.encode(prefix + t, add_bos=False)
            if cls_id is not None:
                ids = [cls_id] + ids
            if sep_id is not None:
                ids = ids + [sep_id]
            idss.append(ids[:cfg.max_position_embeddings])
        n_tok = sum(len(i) for i in idss)
        S = _bucket(max(len(i) for i in idss))
        ids_arr = np.zeros((len(idss), S), np.int32)
        mask = np.zeros((len(idss), S), np.float32)
        for r, ids in enumerate(idss):
            ids_arr[r, :len(ids)] = ids
            mask[r, :len(ids)] = 1.0
        vecs = np.asarray(fwd(params, cfg, jnp.asarray(ids_arr),
                              jnp.asarray(mask), normalize=normalize))
        return vecs, n_tok

    return embed


def run_embed(args):
    texts = list(args.prompt or [])
    if args.input_file:
        with open(args.input_file) as f:
            texts += [ln.rstrip("\n") for ln in f if ln.strip()]
    embedder = make_embedder(args.gguf_file, normalize=not args.no_normalize,
                             lora=args.lora)
    if args.http:
        from ..serving.server import serve_http

        class _NullEngine:  # embeddings-only server: no generation slots
            slot_req: list = []
            queue: list = []
            completed: list = []

            def step(self):
                return 0

            def submit(self, *a, **k):
                raise ValueError("this server only hosts /v1/embeddings")

        try:
            reranker = make_reranker(args.gguf_file)
        except ValueError:
            reranker = None  # plain embedder GGUF (no classifier head)
        serve_http(_NullEngine(), host=args.host, port=args.port,
                   embedder=embedder, reranker=reranker)
        return
    if not texts:
        raise SystemExit("need --prompt or --input-file (or --http)")
    vecs, n_tok = embedder(texts)
    out = {"n_tokens": n_tok, "dim": int(vecs.shape[1]),
           "embeddings": [[round(float(x), 7) for x in v] for v in vecs]}
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f)
        print(f"wrote {len(texts)} embeddings (dim {out['dim']}) "
              f"to {args.json_out}")
    else:
        print(json.dumps(out))


SUBCOMMANDS["embed"] = (build_embed, run_embed)


def make_reranker(gguf_file):
    """(query, [docs]) -> relevance scores over a bert-arch classifier GGUF
    (llama.cpp /rerank analogue: [CLS] query [SEP] doc [SEP] pairs through
    the packed classification head)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..formats.gguf import GGUFReader
    from ..models import bert
    from ..serving import tokenizer as gtok

    params, cfg = bert.load_gguf_encoder(gguf_file)
    if params.get("cls_out_w") is None and params.get("cls_w") is None:
        raise ValueError(f"{gguf_file} carries no classification head "
                         "(cls/cls.output tensors)")
    gg = gtok.from_gguf(GGUFReader(gguf_file))
    if gg is None:
        raise ValueError(f"{gguf_file} carries no tokenizer.ggml vocab")
    cls_id = gg.vocab.get("[CLS]", gg.vocab.get("<s>"))
    sep_id = gg.vocab.get("[SEP]", gg.vocab.get("</s>"))

    fwd = jax.jit(bert.rank_score, static_argnames=("cfg",))

    def rank(query, docs):
        q_ids = gg.encode(query, add_bos=False)
        idss = []
        for doc in docs:
            ids = []
            if cls_id is not None:
                ids.append(cls_id)
            ids += q_ids
            if sep_id is not None:
                ids.append(sep_id)
            ids += gg.encode(doc, add_bos=False)
            if sep_id is not None:
                ids.append(sep_id)
            idss.append(ids[:cfg.max_position_embeddings])
        S = max(16, max(len(i) for i in idss))
        ids_arr = np.zeros((len(idss), S), np.int32)
        mask = np.zeros((len(idss), S), np.float32)
        for r, ids in enumerate(idss):
            ids_arr[r, :len(ids)] = ids
            mask[r, :len(ids)] = 1.0
        return np.asarray(fwd(params, cfg, jnp.asarray(ids_arr),
                              jnp.asarray(mask)))

    return rank


def build_rank(p: argparse.ArgumentParser):
    p.add_argument("--gguf-file", required=True,
                   help="bert-arch classifier GGUF (reranker)")
    p.add_argument("--query", required=True)
    p.add_argument("--documents", nargs="+", required=True)


def run_rank(args):
    scores = make_reranker(args.gguf_file)(args.query, args.documents)
    out = sorted(
        ({"index": i, "relevance_score": float(s)}
         for i, s in enumerate(scores)),
        key=lambda d: -d["relevance_score"])
    print(json.dumps({"results": out}))


SUBCOMMANDS["rank"] = (build_rank, run_rank)
