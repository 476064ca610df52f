"""Unified CLI: ``python -m gptq_gguf_tpu <subcommand> ...``

Subcommands map 1:1 onto the reference's CLI entry points (SURVEY.md §1):
quantize (quant.py), pack (pack_gptq_into_gguf.py), split (gguf_splitter),
stitch (gguf_stitcher), convert-config (config_converter), build-db
(build_ep_database.sh), search (evo_quant_search), ppl (ppleval),
serve (new TPU serving engine), embed (encoder embeddings).
"""

import argparse
import sys


def main(argv=None):
    from .cli import quantize as quantize_cli
    from .cli.tools import SUBCOMMANDS

    parser = argparse.ArgumentParser(prog="gptq_gguf_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    qp = sub.add_parser("quantize", help="GPTQ-quantize an HF model to K-quant artifacts")
    quantize_cli.build_parser(qp)
    qp.set_defaults(_run=quantize_cli.run)

    for name, (build, run) in SUBCOMMANDS.items():
        p = sub.add_parser(name)
        build(p)
        p.set_defaults(_run=run)

    args = parser.parse_args(argv)
    args._run(args)


if __name__ == "__main__":
    main()
