"""DisCo inference CLI (parity with /root/reference/test_disco_audio.py — identical
shape to the CaMN CLI)."""
from __future__ import annotations


def main():
    from ..models.api import DiscoAudioModel
    from ..models.configs import DiscoAudioConfig
    from .test_camn import build_parser, run

    args = build_parser().parse_args()
    run(
        args, DiscoAudioModel, DiscoAudioConfig,
        lambda m, a, s, cdt: m(a, s, seed_frames=m.config.seed_frames,
                               compute_dtype=cdt)["motion_axis_angle"],
    )


if __name__ == "__main__":
    main()
