"""End-to-end tiny-model pipeline tests (random weights, CPU)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from gen3c_tpu.pipelines.factory import build_gen3c_model
from gen3c_tpu.pipelines.gen3c_pipeline import Gen3cPipeline


@pytest.fixture(scope="module")
def tiny_model():
    return build_gen3c_model("gen3c_tiny", checkpoint_dir=None, seed=0)


def test_single_chunk_generation(tiny_model):
    model, preset = tiny_model
    h, w, chunk = preset.height, preset.width, preset.chunk_size
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 1, h, w).astype(np.float32) * 2 - 1
    n_buf = 1
    warps = rng.rand(1, chunk, n_buf, 3, h, w).astype(np.float32) * 2 - 1
    masks = (rng.rand(1, chunk, n_buf, 1, h, w) > 0.3).astype(np.float32)

    pipe = Gen3cPipeline(model=model, num_steps=5, height=h, width=w)
    out = pipe.generate(
        prompt="a test scene",
        image_frames=image,
        rendered_warp_images=jnp.asarray(warps),
        rendered_warp_masks=jnp.asarray(masks),
    )
    assert out is not None
    video, prompt = out
    assert video.shape == (chunk, h, w, 3)
    assert video.dtype == np.uint8
    assert prompt == "a test scene"


def test_cli_end_to_end(tmp_path, tiny_model):
    """Drive the full CLI: image -> depth -> cache -> 2 AR chunks -> mp4."""
    from PIL import Image

    from gen3c_tpu.pipelines import gen3c_single_image as cli

    img_path = tmp_path / "input.png"
    rng = np.random.RandomState(0)
    Image.fromarray(
        (rng.rand(96, 160, 3) * 255).astype(np.uint8)
    ).save(img_path)

    parser = cli.create_parser()
    args = parser.parse_args(
        [
            "--input_image_path", str(img_path),
            "--model_preset", "gen3c_tiny",
            "--checkpoint_dir", str(tmp_path / "none"),
            "--num_video_frames", "17",  # 2 AR chunks of 9 (overlap 1)
            "--num_steps", "3",
            "--trajectory", "left",
            "--video_save_folder", str(tmp_path / "out"),
            "--depth_source", "heuristic",
            "--save_buffer",
        ]
    )
    save_path = cli.demo(args)
    # video saved as mp4 or PNG-frame fallback
    assert os.path.exists(save_path) or os.path.isdir(
        os.path.splitext(save_path)[0]
    )


def test_num_video_frames_validation(tiny_model):
    from gen3c_tpu.pipelines import gen3c_single_image as cli

    args = cli.create_parser().parse_args(
        ["--input_image_path", "x.png", "--num_video_frames", "18"]
    )
    with pytest.raises(AssertionError):
        cli.validate_args(args, chunk_size=9)
