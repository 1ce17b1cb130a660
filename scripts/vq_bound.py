"""VQ round-trip windowed-FGD bound on a BEAT2 val split.

Computes EXACTLY the metric the EMAGE trainer logs as ``val/metric`` (windowed
FGD over decoded predictions, cli/_train_common.py windowed_fgd_val), but with
the prediction replaced by the GT -> map2index -> decode round trip through a
tokenizer suite. This is the reconstruction bound: no audio model trained
against this suite can validate below it, because the val path decodes through
the same frozen tokenizers (the reference kept the same check as commented-out
dev code, /root/reference/train_emage_audio.py:63-68).

Diagnosis tool for the round-4 flat-val-FGD finding: a random suite's bound
tells whether the audio model ever had anything to gain.

Usage (repo root):
  python /root/repo/scripts/vq_bound.py --random_vq            # seed-777 random suite
  python /root/repo/scripts/vq_bound.py --vq_path outputs/<vq_exp>   # trained suite
  [--meta datasets/synth_beat2/data_json/beat2_s20_l64_speaker2.json] [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meta", default="datasets/synth_beat2/data_json/"
                                      "beat2_s20_l64_speaker2.json")
    ap.add_argument("--vq_path", default=None)
    ap.add_argument("--random_vq", action="store_true")
    ap.add_argument("--mode", default="val", choices=["val", "test", "train"])
    ap.add_argument("--bs", type=int, default=56)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pantomatrix_tpu.core.rotations import axis_angle_to_rotation_6d
    from pantomatrix_tpu.data.beat2 import BEAT2Dataset, DataLoader
    from pantomatrix_tpu.cli._train_common import windowed_fgd_val
    from pantomatrix_tpu.cli.train_emage import load_suite
    from pantomatrix_tpu.models.emage_vq import vq_decode, vq_map2index

    suite = load_suite(args.vq_path, args.random_vq)
    ds = BEAT2Dataset([args.meta], args.mode, 30, 16000, None,
                      variant="emage_footcontact")
    if not len(ds):
        raise SystemExit(f"no {args.mode}-mode clips in {args.meta}")
    loader = DataLoader(ds, min(args.bs, len(ds)), shuffle=False)
    print(f"{len(ds)} {args.mode} clips, batch {loader.batch_size}")

    def roundtrip(params, batch):
        del params
        motion = jnp.asarray(batch["motion"])
        bs, t, jc = motion.shape
        j = jc // 3
        gt6 = axis_angle_to_rotation_6d(
            motion.reshape(bs, t, j, 3)).reshape(bs, t, j * 6)
        idx = vq_map2index(suite, gt6, jnp.asarray(batch["expressions"]),
                           jnp.asarray(batch["foot_contact"]),
                           jnp.asarray(batch["trans"]))
        dec = vq_decode(suite, face_index=idx["face"], upper_index=idx["upper"],
                        hands_index=idx["hands"], lower_index=idx["lower"])
        return dec["all_motion4inference"][:, :, :-7], gt6

    val_fn = windowed_fgd_val(loader, roundtrip)
    bound = float(val_fn({}, 0))
    src = args.vq_path or "random(seed 777)"
    print(f"VQ round-trip windowed FGD bound [{src}]: {bound:.4f}")


if __name__ == "__main__":
    main()
