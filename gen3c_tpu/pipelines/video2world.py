"""Video-to-world generation CLI (video2world.py parity).

A thin entry point over pipelines.text2world in video2world mode: the
reference ships text2world.py and video2world.py as separate scripts;
here both share one implementation (--mode video2world preset swap,
condition-latent construction in text2world.generate_world).

Usage:
  python -m gen3c_tpu.pipelines.video2world \
      --input_image_path img.png --prompt "..." [--num_input_frames 1]
"""

from __future__ import annotations

from gen3c_tpu.pipelines.text2world import create_parser, demo


def main(argv=None) -> None:
    parser = create_parser()
    parser.set_defaults(mode="video2world")
    args = parser.parse_args(argv)
    args.mode = "video2world"
    demo(args)


if __name__ == "__main__":
    main()
