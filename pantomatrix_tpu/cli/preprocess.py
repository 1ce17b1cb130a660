"""Dataset preprocessing CLI — the reference ships these as three loose scripts
(/root/reference/datasets/process_testdata.py, foot_contact.py, clustering.py);
here they are subcommands over the same first-party implementations
(data/preprocess.py).

Usage:
  python -m pantomatrix_tpu.cli.preprocess index --beat2_root <dir> \
      --output_dir ./data_json [--stride 20 --length 64 --speaker 2]
  python -m pantomatrix_tpu.cli.preprocess footcontact \
      --motion_dir <dir>/smplxflame_30 --output_dir <dir>/footcontact
  python -m pantomatrix_tpu.cli.preprocess disco --json <clip index json>
"""
from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index", help="build the clip-metadata JSON")
    pi.add_argument("--beat2_root", required=True)
    pi.add_argument("--output_dir", required=True)
    pi.add_argument("--stride", type=int, default=20)
    pi.add_argument("--length", type=int, default=64)
    pi.add_argument("--speaker", type=int, default=2)
    pi.add_argument("--use_additional", action="store_true")

    pf = sub.add_parser("footcontact", help="extract per-take (t,4) foot contact")
    pf.add_argument("--motion_dir", required=True)
    pf.add_argument("--output_dir", required=True)
    pf.add_argument("--threshold", type=float, default=0.01)

    pd = sub.add_parser("disco", help="add KMeans content/rhythm labels to an index")
    pd.add_argument("--json", required=True)
    pd.add_argument("--output", default=None)
    pd.add_argument("--clusters", type=int, default=10)

    args = p.parse_args()
    from ..data import preprocess

    if args.cmd == "index":
        out = preprocess.build_clip_index(
            args.beat2_root, args.output_dir, stride=args.stride,
            motion_length=args.length, speaker_target=args.speaker,
            use_additional=args.use_additional,
        )
        print(out)
    elif args.cmd == "footcontact":
        preprocess.extract_foot_contact(args.motion_dir, args.output_dir,
                                        threshold=args.threshold)
        print(args.output_dir)
    elif args.cmd == "disco":
        out = preprocess.build_disco_labels(args.json, args.output,
                                            n_clusters=args.clusters)
        print(out)


if __name__ == "__main__":
    main()
