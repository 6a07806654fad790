"""Guardrail + prompt upsampler tests."""

import numpy as np

from gen3c_tpu.aux.guardrail import (
    Blocklist,
    GuardrailRunner,
    create_text_guardrail_runner,
    create_video_guardrail_runner,
)
from gen3c_tpu.aux.prompt_upsampler import (
    PassthroughUpsampler,
    TemplateUpsampler,
    create_prompt_upsampler,
)


def test_blocklist_blocks_and_passes():
    bl = Blocklist(extra_words=["forbiddenword"])
    runner = GuardrailRunner(safety_models=[bl])
    safe, _ = runner.run_safety_check("a nice landscape")
    assert safe
    safe, msg = runner.run_safety_check("a FORBIDDENWORD, with punctuation!")
    assert not safe and "forbiddenword" in msg


def test_runner_convenience_interface():
    bl = Blocklist(extra_words=["bad"])
    runner = GuardrailRunner(safety_models=[bl])
    assert runner.run("good prompt") is True
    assert runner.run("bad prompt") is False


def test_video_runner_passthrough_without_checkpoints():
    runner = create_video_guardrail_runner(None)
    frames = np.zeros((3, 8, 8, 3), np.uint8)
    out = runner.run(frames)
    np.testing.assert_array_equal(out, frames)


def test_text_runner_degrades_to_blocklist():
    runner = create_text_guardrail_runner(None)
    assert runner.run("an innocent prompt") is True


def test_prompt_upsampler_modes():
    assert isinstance(create_prompt_upsampler(enabled=False),
                      PassthroughUpsampler)
    up = TemplateUpsampler()
    out = up.upsample("a red car")
    assert "a red car" in out and len(out) > len("a red car")
    assert PassthroughUpsampler().upsample("x") == "x"
