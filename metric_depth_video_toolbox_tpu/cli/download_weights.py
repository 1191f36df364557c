"""``mdvt download-weights`` — fetch + convert published checkpoints.

Reference download_weights.py equivalent: pulls a model family's
published torch checkpoints into a local weights dir (direct URLs via
urllib, Hugging Face repos via huggingface_hub snapshots), and
optionally runs the checkpoint converter (models.convert) so the
result loads straight into the JAX engines. ``--dry_run`` prints the
download plan without touching the network; in zero-egress
environments the tool names exactly what is missing and from where.
"""

from __future__ import annotations

import argparse

from metric_depth_video_toolbox_tpu.models import convert


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   choices=sorted(convert.WEIGHT_REGISTRY),
                   help="model family (reference download_weights.py "
                        "MODELS table)")
    p.add_argument("--dest_dir", default="weights")
    p.add_argument("--dry_run", action="store_true",
                   help="print the download plan and exit")
    p.add_argument("--convert", action="store_true",
                   help="run the checkpoint converter on the downloaded "
                        "file(s) and save the JAX params next to them")
    return p


def run(args):
    paths = convert.download_weights(args.model, args.dest_dir,
                                     dry_run=args.dry_run)
    if args.dry_run:
        return paths
    for p in paths:
        print(f"ready: {p}")
    if args.convert:
        kind = convert.WEIGHT_REGISTRY[args.model]["kind"]
        for p in paths:
            out = p + ".mdvt.msgpack"
            params = convert.convert_torch_file(p, kind)
            import flax.serialization as ser
            with open(out, "wb") as f:
                f.write(ser.to_bytes(params))
            print(f"converted: {out}")
    return paths


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
