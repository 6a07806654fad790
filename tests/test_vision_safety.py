"""Vision guardrail models: SigLIP encoder parity vs transformers (torch
CPU oracle), safety classifier parity, RetinaFace detector invariants."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_siglip_vision_parity_vs_transformers():
    """JAX SigLIP pooled features match a random-init torch
    SiglipVisionModel (the oracle for the so400m production config)."""
    import torch
    from transformers import SiglipVisionConfig as HFConfig
    from transformers import SiglipVisionModel

    from gen3c_tpu.aux.siglip import (
        SiglipVisionConfig,
        convert_hf_siglip_vision,
        siglip_image_features,
    )

    hf_cfg = HFConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
        hidden_act="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    model = SiglipVisionModel(hf_cfg).eval()

    cfg = SiglipVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
    )
    params = convert_hf_siglip_vision(model.state_dict(), cfg)

    rng = np.random.RandomState(1)
    pixels = rng.randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref = model(
            pixel_values=torch.from_numpy(pixels)
        ).pooler_output.numpy()
    got = np.asarray(siglip_image_features(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_safety_classifier_parity():
    import torch

    from gen3c_tpu.aux.siglip import (
        convert_safety_classifier,
        safety_classifier_apply,
    )

    torch.manual_seed(0)
    net = torch.nn.Sequential(
        torch.nn.Linear(16, 512),
        torch.nn.BatchNorm1d(512),
        torch.nn.ReLU(),
        torch.nn.Linear(512, 256),
        torch.nn.BatchNorm1d(256),
        torch.nn.ReLU(),
        torch.nn.Linear(256, 7),
    )
    # give BatchNorm non-trivial running stats
    net.train()
    with torch.no_grad():
        for _ in range(3):
            net(torch.randn(32, 16))
    net.eval()
    sd = {f"network.layers.{k}": v for k, v in net.state_dict().items()}
    params = convert_safety_classifier(sd)
    x = np.random.RandomState(2).randn(4, 16).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = np.asarray(safety_classifier_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_preprocess_frame_range():
    from gen3c_tpu.aux.siglip import preprocess_frame

    frame = np.zeros((10, 12, 3), np.uint8)
    frame[:, :, 0] = 255
    out = preprocess_frame(frame, image_size=32)
    assert out.shape == (3, 32, 32)
    np.testing.assert_allclose(out[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[1], -1.0, atol=1e-6)


def test_prior_boxes_layout():
    from gen3c_tpu.aux.retinaface import prior_boxes

    pri = prior_boxes(64, 64)
    # (ceil(64/8)^2 + ceil(64/16)^2 + ceil(64/32)^2) * 2 anchors
    assert pri.shape == ((8 * 8 + 4 * 4 + 2 * 2) * 2, 4)
    # first anchor: cx=cy=(0+0.5)*8/64, sizes 16/64
    np.testing.assert_allclose(pri[0], [0.0625, 0.0625, 0.25, 0.25])
    np.testing.assert_allclose(pri[1], [0.0625, 0.0625, 0.5, 0.5])


def test_decode_boxes_identity_and_shift():
    from gen3c_tpu.aux.retinaface import VARIANCES, decode_boxes

    priors = np.array([[0.5, 0.5, 0.2, 0.4]], np.float32)
    # zero offsets -> prior itself in corner form
    out = decode_boxes(np.zeros((1, 1, 4), np.float32), priors)[0, 0]
    np.testing.assert_allclose(out, [0.4, 0.3, 0.6, 0.7], atol=1e-6)
    # x shift of one variance unit moves center by var0 * prior_w
    loc = np.array([[[1.0, 0, 0, 0]]], np.float32)
    out2 = decode_boxes(loc, priors)[0, 0]
    np.testing.assert_allclose(
        out2[0] - out[0], VARIANCES[0] * 0.2, atol=1e-6
    )


def test_nms_suppresses_overlaps():
    from gen3c_tpu.aux.retinaface import filter_detected_boxes, nms

    dets = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],  # heavy overlap with first
            [50, 50, 60, 60, 0.7],
        ],
        np.float32,
    )
    keep = nms(dets, 0.4)
    assert keep == [0, 2]
    boxes = filter_detected_boxes(
        dets[:, :4], dets[:, 4], confidence_threshold=0.75
    )
    assert len(boxes) == 1  # only the 0.9 and 0.8 pass conf; NMS keeps one


def test_retinaface_forward_shapes_and_blur():
    import jax

    from gen3c_tpu.aux.retinaface import (
        blur_faces_in_frames,
        init_retinaface_params,
        prior_boxes,
        retinaface_forward,
    )

    params = init_retinaface_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 3, 64, 64), jnp.float32)
    loc, conf = jax.device_get(retinaface_forward(params, x))
    n_priors = len(prior_boxes(64, 64))
    assert loc.shape == (1, n_priors, 4)
    assert conf.shape == (1, n_priors, 2)
    np.testing.assert_allclose(conf.sum(-1), 1.0, atol=1e-5)

    frames = np.random.RandomState(0).randint(
        0, 255, (2, 64, 64, 3), np.uint8
    )
    out = blur_faces_in_frames(params, frames)
    assert out.shape == frames.shape and out.dtype == np.uint8


def test_pixelate_face():
    from gen3c_tpu.aux.retinaface import pixelate_face

    face = np.arange(40 * 30 * 3, dtype=np.uint8).reshape(40, 30, 3)
    out = pixelate_face(face)
    assert out.shape == face.shape
    # 5x5 blocks: each block is constant
    assert (out[:8, :6] == out[0, 0]).all()


def test_video_content_safety_filter_with_tiny_checkpoint(tmp_path):
    """Full VideoContentSafetyFilter flow against a tiny local SigLIP +
    random safety head saved in the expected checkpoint layout."""
    import torch
    from transformers import SiglipConfig, SiglipModel

    from gen3c_tpu.aux.guardrail import VideoContentSafetyFilter

    ckpt_root = tmp_path
    filt_dir = (
        ckpt_root / "nvidia" / "Cosmos-Guardrail1"
        / "video_content_safety_filter"
    )
    filt_dir.mkdir(parents=True)
    cfg = SiglipConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=2, image_size=28, patch_size=14,
            hidden_act="gelu_pytorch_tanh",
        ),
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=2, vocab_size=64, max_position_embeddings=16,
        ),
    )
    torch.manual_seed(0)
    siglip_dir = tmp_path / "tiny_siglip"
    SiglipModel(cfg).save_pretrained(siglip_dir)

    head = torch.nn.Sequential(
        torch.nn.Linear(32, 512), torch.nn.BatchNorm1d(512),
        torch.nn.ReLU(), torch.nn.Linear(512, 256),
        torch.nn.BatchNorm1d(256), torch.nn.ReLU(), torch.nn.Linear(256, 7),
    ).eval()
    sd = {f"network.layers.{k}": v for k, v in head.state_dict().items()}
    torch.save({"model": sd}, filt_dir / "safety_filter.pt")

    filt = VideoContentSafetyFilter(str(ckpt_root),
                                    siglip_name=str(siglip_dir))
    frames = np.random.RandomState(0).randint(0, 255, (2, 20, 24, 3),
                                              np.uint8)
    safe, msg = filt.is_safe(frames)
    assert isinstance(safe, bool) and msg


def test_retinaface_filter_with_synthetic_checkpoint(tmp_path):
    """RetinaFaceFilter loads a synthetic Resnet50_Final.pth-layout state
    dict (exercises convert_retinaface key mapping end-to-end)."""
    import jax
    import torch

    from gen3c_tpu.aux.guardrail import RetinaFaceFilter
    from gen3c_tpu.aux.retinaface import init_retinaface_params

    # export a random param tree back to the torch key layout
    params = init_retinaface_params(jax.random.PRNGKey(0))
    sd = {}

    def put_conv(name, p):
        sd[f"{name}.weight"] = torch.from_numpy(np.asarray(p["w"]))
        if "b" in p:
            sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["b"]))

    def put_bn(name, p):
        sd[f"{name}.weight"] = torch.from_numpy(np.asarray(p["scale"]))
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["bias"]))
        sd[f"{name}.running_mean"] = torch.from_numpy(np.asarray(p["mean"]))
        sd[f"{name}.running_var"] = torch.from_numpy(np.asarray(p["var"]))

    body = params["body"]
    put_conv("body.conv1", body["conv1"])
    put_bn("body.bn1", body["bn1"])
    for li, n in (("layer1", 3), ("layer2", 4), ("layer3", 6), ("layer4", 3)):
        for i in range(n):
            blk = body[li][i]
            for c in ("conv1", "conv2", "conv3"):
                put_conv(f"body.{li}.{i}.{c}", blk[c])
            for b in ("bn1", "bn2", "bn3"):
                put_bn(f"body.{li}.{i}.{b}", blk[b])
            if "downsample" in blk:
                put_conv(f"body.{li}.{i}.downsample.0",
                         blk["downsample"]["conv"])
                put_bn(f"body.{li}.{i}.downsample.1", blk["downsample"]["bn"])
    for k in ("output1", "output2", "output3", "merge1", "merge2"):
        put_conv(f"fpn.{k}.0", params["fpn"][k]["conv"])
        put_bn(f"fpn.{k}.1", params["fpn"][k]["bn"])
    for i in range(3):
        for k in ("conv3X3", "conv5X5_1", "conv5X5_2", "conv7X7_2",
                  "conv7x7_3"):
            put_conv(f"ssh{i+1}.{k}.0", params[f"ssh{i+1}"][k]["conv"])
            put_bn(f"ssh{i+1}.{k}.1", params[f"ssh{i+1}"][k]["bn"])
        put_conv(f"ClassHead.{i}.conv1x1", params["ClassHead"][i])
        put_conv(f"BboxHead.{i}.conv1x1", params["BboxHead"][i])

    path = tmp_path / "nvidia" / "Cosmos-Guardrail1" / "face_blur_filter"
    path.mkdir(parents=True)
    torch.save({f"module.{k}": v for k, v in sd.items()},
               path / "Resnet50_Final.pth")

    filt = RetinaFaceFilter(str(tmp_path))
    frames = np.random.RandomState(1).randint(0, 255, (1, 64, 64, 3),
                                              np.uint8)
    out = filt.postprocess(frames)
    assert out.shape == frames.shape


def test_hf_llama_conversion_parity():
    """JAX AR transformer + convert_hf_llama match a random-init torch
    LlamaForCausalLM (incl. llama3 rope scaling — the Llama-Guard-3-8B
    configuration at tiny scale)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from gen3c_tpu.models.ar_transformer import (
        ARConfig,
        ar_forward,
        rope_tables,
    )
    from gen3c_tpu.models.convert import convert_hf_llama

    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rope_theta=500000.0,
        rms_norm_eps=1e-5,  # llama-3-family value (= ARConfig.norm_eps)
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 32,
        },
        attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()

    cfg = ARConfig(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=128,
        ffn_hidden_size=128, max_seq_len=64, rope_theta=500000.0,
        use_qk_normalization=False,
        rope_scaling=(8.0, 1.0, 4.0, 32),
        dtype=jnp.float32,
    )
    params = convert_hf_llama(model.state_dict(), cfg)

    tokens = np.random.RandomState(0).randint(0, 128, (2, 12))
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    got, _ = ar_forward(
        params, cfg, jnp.asarray(tokens, jnp.int32), rope_tables(cfg)
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_llamaguard3_with_tiny_checkpoint(tmp_path):
    """LlamaGuard3 end-to-end on a tiny random llama saved in the
    expected checkpoint layout (JAX generate path + tokenizer chat
    template)."""
    import torch
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import (
        LlamaConfig,
        LlamaForCausalLM,
        PreTrainedTokenizerFast,
    )

    from gen3c_tpu.aux.guardrail import LlamaGuard3

    path = tmp_path / "meta-llama" / "Llama-Guard-3-8B"
    path.mkdir(parents=True)
    vocab = {w: i for i, w in enumerate(
        ["<unk>", "hello", "world", "safe", "unsafe", "a", "b"]
    )}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>")
    fast.chat_template = (
        "{% for m in messages %}{{ m['content'] }}{% endfor %}"
    )
    fast.save_pretrained(path)

    torch.manual_seed(0)
    LlamaForCausalLM(
        LlamaConfig(
            vocab_size=len(vocab), hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, max_position_embeddings=64,
            rms_norm_eps=1e-5, tie_word_embeddings=False,
        )
    ).save_pretrained(path)

    guard = LlamaGuard3(str(tmp_path), max_seq_len=64)
    safe, msg = guard.is_safe("hello world a b")
    assert isinstance(safe, bool)


def test_t5_encoder_parity():
    """JAX T5 encoder matches transformers' torch T5EncoderModel on a
    tiny random config (incl. relative position bias + padding mask)."""
    import torch
    from transformers import T5Config, T5EncoderModel

    from gen3c_tpu.models.t5 import convert_hf_t5_encoder, t5_encoder_forward

    hf_cfg = T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, feed_forward_proj="relu",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()
    params = convert_hf_t5_encoder(model.state_dict(), dtype=jnp.float32)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 100, (2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 6:] = 0  # ragged padding
    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(
        t5_encoder_forward(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
            num_heads=4,
        )
    )
    # compare only unmasked positions (HF computes garbage on padding too,
    # but the pipeline zeroes them anyway)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1, :6], ref[1, :6], rtol=2e-4, atol=2e-4)


def test_jax_prompt_upsampler_with_tiny_checkpoint(tmp_path):
    import torch
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import (
        LlamaConfig,
        LlamaForCausalLM,
        PreTrainedTokenizerFast,
    )

    from gen3c_tpu.aux.prompt_upsampler import JaxPromptUpsampler

    path = tmp_path / "Pixtral-12B"
    path.mkdir(parents=True)
    vocab = {w: i for i, w in enumerate(
        ["<unk>", "a", "sunny", "beach", "video", "detailed"]
    )}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>")
    fast.chat_template = (
        "{% for m in messages %}{{ m['content'] }} {% endfor %}"
    )
    fast.save_pretrained(path)
    torch.manual_seed(0)
    LlamaForCausalLM(
        LlamaConfig(
            vocab_size=len(vocab), hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=2,
            num_key_value_heads=1, max_position_embeddings=128,
            rms_norm_eps=1e-5, tie_word_embeddings=False,
        )
    ).save_pretrained(path)

    ups = JaxPromptUpsampler(str(path), max_new_tokens=4, max_seq_len=128)
    out = ups.upsample("a sunny beach")
    assert isinstance(out, str) and out


def _tiny_vocab_tokenizer(path):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    vocab = {w: i for i, w in enumerate(
        ["<unk>", "hello", "world", "safe", "unsafe", "a", "b", "[INST]",
         "[/INST]", "User:"]
    )}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>")
    fast.save_pretrained(path)
    return len(vocab)


def test_aegis_lora_merge_matches_peft(tmp_path):
    """Our in-place LoRA merge must equal peft's merge_and_unload on the
    converted weights (the exactness argument for running the merged
    model instead of the PeftModel wrapper, aegis/aegis.py:48)."""
    import torch
    from peft import LoraConfig, get_peft_model
    from transformers import LlamaConfig, LlamaForCausalLM

    from gen3c_tpu.aux.guardrail import (
        load_peft_adapter_state,
        merge_peft_lora_into_llama,
    )
    from gen3c_tpu.models.ar_transformer import ARConfig
    from gen3c_tpu.models.convert import convert_hf_llama

    torch.manual_seed(0)
    base = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=32, hidden_size=16, intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, max_position_embeddings=32,
            tie_word_embeddings=False,
        )
    )
    cfg = ARConfig(
        dim=16, n_layers=2, n_heads=2, n_kv_heads=2, vocab_size=32,
        ffn_hidden_size=32, max_seq_len=32, use_qk_normalization=False,
        dtype=jnp.float32,
    )
    # snapshot base weights BEFORE peft wraps/renames the modules
    base_sd = {k: v.clone() for k, v in base.state_dict().items()}
    peft_model = get_peft_model(
        base,
        LoraConfig(
            r=4, lora_alpha=8,
            target_modules=["q_proj", "v_proj", "gate_proj", "down_proj"],
        ),
    )
    # randomize lora_B (init is zeros -> merge would be a no-op)
    with torch.no_grad():
        for n, p in peft_model.named_parameters():
            if "lora_B" in n:
                p.copy_(torch.randn_like(p) * 0.1)
    adapter_dir = tmp_path / "adapter"
    peft_model.save_pretrained(adapter_dir)

    params = convert_hf_llama(base_sd, cfg, dtype=jnp.float32)
    sub = [d for d in adapter_dir.iterdir() if d.is_dir()]
    adir = sub[0] if sub else adapter_dir
    state = load_peft_adapter_state(str(adir))
    n_merged = merge_peft_lora_into_llama(params, state, cfg,
                                          alpha=8, r=4)
    assert n_merged == 8  # 4 targets x 2 layers

    merged_torch = peft_model.merge_and_unload()
    ref = convert_hf_llama(merged_torch.state_dict(), cfg,
                           dtype=jnp.float32)
    for li in range(2):
        for k in ("wq", "wv", "w1", "w2", "wk", "wo", "w3"):
            np.testing.assert_allclose(
                np.asarray(params["layers"][li][k]),
                np.asarray(ref["layers"][li][k]),
                rtol=1e-5, atol=1e-6, err_msg=f"layer {li} {k}",
            )


def test_aegis_with_tiny_checkpoint(tmp_path):
    """Aegis end-to-end: base + adapter in the reference checkpoint
    layout, merged at load, JAX generation, verdict parsing."""
    import torch
    from peft import LoraConfig, get_peft_model
    from transformers import LlamaConfig, LlamaForCausalLM

    from gen3c_tpu.aux.guardrail import Aegis

    base_dir = tmp_path / "meta-llama" / "LlamaGuard-7b"
    adapter_dir = (
        tmp_path / "nvidia"
        / "Aegis-AI-Content-Safety-LlamaGuard-Defensive-1.0"
    )
    base_dir.mkdir(parents=True)
    adapter_dir.mkdir(parents=True)
    vocab_size = _tiny_vocab_tokenizer(base_dir)

    torch.manual_seed(0)
    base = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=vocab_size, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, max_position_embeddings=256,
            tie_word_embeddings=False,
        )
    )
    base.save_pretrained(base_dir)
    peft_model = get_peft_model(
        base, LoraConfig(r=2, lora_alpha=4,
                         target_modules=["q_proj", "v_proj"])
    )
    with torch.no_grad():
        for n, p in peft_model.named_parameters():
            if "lora_B" in n:
                p.copy_(torch.randn_like(p) * 0.1)
    peft_model.save_pretrained(adapter_dir)
    # peft may nest the adapter in a subdir ("default"); flatten
    import shutil

    if not (adapter_dir / "adapter_config.json").exists():
        sub = next(d for d in adapter_dir.iterdir() if d.is_dir())
        for f in sub.iterdir():
            shutil.move(str(f), adapter_dir / f.name)

    guard = Aegis(str(tmp_path), max_seq_len=256)
    safe, msg = guard.is_safe("hello world")
    assert isinstance(safe, bool)
    # verdict parsing (aegis/aegis.py:72-86 parity)
    assert guard.block_message("unsafe\nO2") == (
        "sexual: this prompt is blocked due to sexually explicit "
        "content."
    )
    assert guard.block_message("unsafe") == "Prompt blocked by Aegis."
    assert guard.block_message("unsafe\nO99") == "Prompt blocked by Aegis."
