"""Model presets + construction (config-registry replacement).

Replaces the reference's hydra ConfigStore experiment nodes
(reference: diffusion/config/registry.py:30-97, config/inference/
cosmos-1-diffusion-gen3c.py:22-54) with plain dataclass presets and a
factory. "gen3c_7b" is the GEN3C_Cosmos_7B experiment; "gen3c_tiny" is a
scaled-down twin for tests/smoke runs (same topology, tiny dims), the
pattern the reference uses in its own unit tests (lora_attn_test.py).
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit import DiTConfig
from gen3c_tpu.models.gen3c import Gen3CModel
from gen3c_tpu.models.vae import CV8x8x8, VAEConfig, VideoTokenizer
from gen3c_tpu.utils import log


@dataclasses.dataclass(frozen=True)
class Gen3CPreset:
    name: str
    dit: DiTConfig
    vae: VAEConfig
    height: int
    width: int
    chunk_size: int  # pixel frames per diffusion call
    frame_buffer_max: int = 2

    @property
    def state_shape(self) -> Tuple[int, int, int, int]:
        lat_t = (self.chunk_size - 1) // self.vae.temporal_compression + 1
        return (
            self.vae.latent_channels,
            lat_t,
            self.height // self.vae.spatial_compression,
            self.width // self.vae.spatial_compression,
        )


GEN3C_7B_PRESET = Gen3CPreset(
    name="gen3c_7b",
    dit=DiTConfig(
        in_channels=16 + 16 * 4 + 1,
        rope_t_extrapolation_ratio=2.0,
    ),
    vae=CV8x8x8,
    height=704,
    width=1280,
    chunk_size=121,
)

GEN3C_TINY_PRESET = Gen3CPreset(
    name="gen3c_tiny",
    dit=DiTConfig(
        in_channels=16 + 16 * 4 + 1,
        model_channels=96,
        num_blocks=2,
        num_heads=4,
        adaln_lora_dim=8,
        crossattn_emb_channels=1024,
        rope_t_extrapolation_ratio=2.0,
        dtype=jnp.float32,
    ),
    vae=VAEConfig(
        channels=16,
        channels_mult=(2, 4, 4),
        num_res_blocks=1,
        attn_resolutions=(),
        resolution=256,
        patch_size=4,
        latent_channels=16,
        z_channels=16,
    ),
    height=96,
    width=160,
    chunk_size=9,
)

PRESETS = {p.name: p for p in (GEN3C_7B_PRESET, GEN3C_TINY_PRESET)}


def build_gen3c_model(
    preset: str | Gen3CPreset = "gen3c_7b",
    checkpoint_dir: Optional[str] = None,
    seed: int = 0,
    param_dtype: Any = jnp.bfloat16,
    num_devices: int = 1,
    quantize: bool | str = False,
    parallel: str = "cp",
    cache_block_span: Optional[Tuple[int, int]] = None,
    cache_span_dtype: str = "bf16",
    offload_dit: bool = False,
    offload_tokenizer: bool = False,
    attn_temporal_window: Optional[int] = None,
    cp_attn: Optional[str] = None,
) -> Tuple[Gen3CModel, Gen3CPreset]:
    """Build a Gen3CModel from a preset, loading weights if available.

    checkpoint_dir layout (mirrors the reference checkpoints/ dir):
      <dir>/GEN3C-Cosmos-7B/model.pt            (torch, converted on load)
      <dir>/gen3c_tpu/dit.npz                   (native, preferred)
      <dir>/Cosmos-Tokenize1-CV8x8x8-720p/{encoder,decoder}.jit + mean_std.pt
      <dir>/gen3c_tpu/vae.npz
    Missing weights -> random init (clearly logged).
    """
    from gen3c_tpu.models.dit import init_dit_params
    from gen3c_tpu.utils.jax_setup import setup_jax

    setup_jax()
    if isinstance(preset, str):
        preset = PRESETS[preset]
    if cache_block_span is not None:
        # Delta-DiT span caching (sampler step_cache_interval>1 skips
        # these blocks, re-applying their cached residual delta)
        lo, hi = cache_block_span
        n = preset.dit.num_blocks
        if not (0 <= lo <= hi <= n):
            raise ValueError(
                f"cache_block_span {cache_block_span} out of range for "
                f"{n} blocks"
            )
        preset = dataclasses.replace(
            preset,
            dit=dataclasses.replace(
                preset.dit, cache_block_span=(lo, hi),
                cache_span_dtype=cache_span_dtype,
            ),
        )

    if cp_attn is not None:
        # context-parallel self-attention strategy (DiTConfig
        # cp_attn_impl): allgather (default), ring, or ulysses
        preset = dataclasses.replace(
            preset,
            dit=dataclasses.replace(preset.dit, cp_attn_impl=cp_attn),
        )
    if attn_temporal_window is not None:
        # temporal-band sparse self-attention (speed/quality knob,
        # measured 1.5-3x on the attention op at window 4..1).
        # allgather CP's splash mask is program-static under SPMD, so
        # multi-device needs ulysses (full local sequence per head
        # group) or ring (dynamic per-rank band masks + step skipping)
        if (parallel != "none" and num_devices > 1
                and preset.dit.cp_attn_impl not in ("ulysses", "ring")):
            raise ValueError(
                "attn_temporal_window over multiple devices requires "
                "cp_attn='ulysses' or 'ring' (the allgather splash "
                "mask is program-static and lacks per-rank q offsets)"
            )
        preset = dataclasses.replace(
            preset,
            dit=dataclasses.replace(
                preset.dit, attn_temporal_window=attn_temporal_window,
            ),
        )

    dit_cfg = preset.dit
    key = jax.random.PRNGKey(seed)
    dit_params = None
    vae_params = None
    latent_mean = latent_std = None
    dit_prequantized = False

    def _acquire_dit():
        """DiT weight acquisition (pre-quantized npz / bf16 npz / torch
        convert / random init) — the slow arm of the build (minutes at
        7B: tunnel-bandwidth-bound upload or on-device init+quantize),
        so it runs on a side thread OVERLAPPED with the VAE/tokenizer
        build below (serving start-to-ready, docs/STATUS.md round-5
        list). Returns (dit_params, prequantized)."""
        if checkpoint_dir:
            from gen3c_tpu.utils import checkpoint as ckpt

            if quantize:
                # pre-quantized native checkpoint (scripts/
                # persist_quantized_dit.py): int8 upload is half the
                # bf16 bytes through the tunnel, and the torch
                # conversion + on-device quantization pass are skipped
                # entirely — serving cold-start path (VERDICT r3 #4)
                mode = "w8a8" if quantize == "w8a8" else "int8"
                native_q = os.path.join(
                    checkpoint_dir, "gen3c_tpu", f"dit_{mode}.npz"
                )
                if os.path.exists(native_q):
                    params = ckpt.load_params_npz_tree(
                        native_q,
                        to_pinned_host=offload_dit and num_devices == 1,
                    )
                    log.info(
                        f"Loaded pre-quantized DiT from {native_q} "
                        f"({'pinned_host' if offload_dit and num_devices == 1 else 'device'})"
                    )
                    return params, True

            native_dit = os.path.join(checkpoint_dir, "gen3c_tpu", "dit.npz")
            torch_dit = os.path.join(
                checkpoint_dir, "GEN3C-Cosmos-7B", "model.pt"
            )
            if os.path.exists(native_dit):
                template = init_dit_params(key, dit_cfg, param_dtype)
                params = ckpt.load_params_npz(
                    native_dit, template, param_dtype
                )
                log.info(f"Loaded DiT weights from {native_dit}")
                return params, False
            if os.path.exists(torch_dit):
                params = ckpt.load_torch_dit_checkpoint(
                    torch_dit, dit_cfg, param_dtype
                )
                log.info(f"Converted DiT weights from {torch_dit}")
                return params, False
        log.warning(
            f"No DiT checkpoint found; RANDOM init ({preset.name}). "
            "Generated videos will be noise-quality."
        )
        return init_dit_params(key, dit_cfg, param_dtype), False

    import threading
    import time as _time

    _t_build0 = _time.perf_counter()
    _dit_box: dict = {}

    def _dit_worker():
        t0 = _time.perf_counter()
        try:
            _dit_box["result"] = _acquire_dit()
        except BaseException as e:  # noqa: BLE001 — re-raised on join
            _dit_box["error"] = e
        _dit_box["seconds"] = _time.perf_counter() - t0

    _dit_thread = threading.Thread(
        target=_dit_worker, name="gen3c-dit-build", daemon=True
    )
    _dit_thread.start()

    if checkpoint_dir:
        from gen3c_tpu.utils import checkpoint as ckpt

        vae_dir = os.path.join(
            checkpoint_dir, "Cosmos-Tokenize1-CV8x8x8-720p"
        )
        native_vae = os.path.join(checkpoint_dir, "gen3c_tpu", "vae.npz")
        if os.path.exists(native_vae):
            vae_params = {
                k: jnp.asarray(v)
                for k, v in ckpt.load_flat_npz(native_vae).items()
            }
            log.info(f"Loaded VAE weights from {native_vae}")
        elif os.path.isdir(vae_dir):
            vae_params, latent_mean, latent_std = (
                ckpt.load_torchscript_tokenizer(vae_dir)
            )
            log.info(f"Converted VAE weights from {vae_dir}")

    if vae_params is None:
        from gen3c_tpu.models.vae import init_vae_params

        log.warning("No VAE checkpoint found; RANDOM init.")
        vae_params = init_vae_params(jax.random.fold_in(key, 1), preset.vae)

    import numpy as np

    tokenizer = VideoTokenizer(
        vae_params,
        preset.vae,
        pixel_chunk_duration=preset.chunk_size,
        latent_mean=(
            jnp.asarray(latent_mean).reshape(
                1, preset.vae.latent_channels, -1, 1, 1
            )[:, :, : (preset.chunk_size - 1) // 8 + 1]
            if latent_mean is not None
            else None
        ),
        latent_std=(
            jnp.asarray(latent_std).reshape(
                1, preset.vae.latent_channels, -1, 1, 1
            )[:, :, : (preset.chunk_size - 1) // 8 + 1]
            if latent_std is not None
            else None
        ),
        spatial_resolution=(preset.height, preset.width),
    )

    _t_vae_done = _time.perf_counter()

    # serving start-to-ready (VERDICT r4 next #5): the VAE compile
    # warming is weight-independent (abstract shapes, zero HBM), so in
    # offload mode kick it NOW — under the minutes-long DiT upload/init
    # arm — instead of waiting for Gen3cPipeline.__post_init__ (which
    # re-warms idempotently; already-compiled shapes are skipped).
    # num_devices == 1 matches the FINAL offload decision (multi-device
    # demotes offload_dit below) — multi-device serving never warmed
    # these single-device-lowered executables before, and must not start.
    if (
        offload_dit
        and num_devices == 1
        and os.environ.get("GEN3C_WARM_COMPILES", "1") != "0"
    ):

        def _early_warm():
            try:
                t0 = _time.perf_counter()
                n = tokenizer.warm_compiles()
                log.info(
                    f"warmed {n} VAE program(s) in "
                    f"{_time.perf_counter() - t0:.1f}s "
                    "(early, under the DiT acquisition)"
                )
            except Exception as e:  # noqa: BLE001 — warming is best-effort
                log.warning(f"early VAE compile warming failed: {e}")

        threading.Thread(
            target=_early_warm, name="gen3c-vae-warm", daemon=True
        ).start()

    # join the overlapped DiT acquisition before the quantize/offload
    # stages that consume it
    _dit_thread.join()
    if "error" in _dit_box:
        raise _dit_box["error"]
    dit_params, dit_prequantized = _dit_box["result"]
    _t_dit_join = _time.perf_counter()

    if quantize and not dit_prequantized:
        from gen3c_tpu.models.quantize import quantize_dit_params_inplace

        # quantize=True/"int8": weight-only; "w8a8": + dynamic int8
        # activations on the MXU (1.5x matmul speedup, ~1% per-matmul err)
        act = quantize == "w8a8"
        log.info("quantizing DiT weights to int8 "
                 + ("(W8A8 dynamic activations)" if act else "(weight-only)"))
        dit_params = quantize_dit_params_inplace(dit_params, act_quant=act)

    streaming_net = None
    if offload_dit and num_devices == 1 and not quantize:
        # UNQUANTIZED offload: the bf16 7B (14.5 GB) cannot be staged
        # whole, so the DiT runs block-STREAMED — blocks rest in
        # pinned_host and flow through HBM overlapping compute
        # (models/dit_streaming.py). Full-precision single-chip serving.
        from gen3c_tpu.models.dit_streaming import StreamingDiT

        log.info("offload without quantization: block-streamed bf16 DiT "
                 "(blocks pinned off-device, streamed per forward)")
        streaming_net = StreamingDiT(dit_params, dit_cfg, free_source=True)
        dit_params = {}
    elif offload_dit and num_devices == 1:
        # params rest in host RAM; Gen3CModel stages them into HBM for
        # the denoise phase only (reference --offload_diffusion_transformer
        # parity — see utils/offload.py for why single-chip 7B needs it).
        # Pre-quantized loads already landed in pinned_host.
        if not dit_prequantized:
            from gen3c_tpu.utils.offload import tree_to_host

            dit_params = tree_to_host(dit_params)
    elif offload_dit:
        log.warning("offload_dit ignored: multi-device serving shards "
                    "params across chips instead")
        offload_dit = False
    if offload_tokenizer:
        from gen3c_tpu.utils.offload import tree_to_host

        tokenizer.params = tree_to_host(tokenizer.params)
        tokenizer.offload = True

    mesh = None
    use_sp = False
    cp_tp_match = re.fullmatch(r"cp(\d+)tp(\d+)(sp)?", parallel)
    cfg_match = re.fullmatch(r"cfg2(?:cp(\d+))?(?:tp(\d+))?", parallel)
    if parallel not in ("cp", "tp") and not cp_tp_match and not cfg_match:
        # validate even when num_devices==1 so a typo'd strategy (or a
        # forgotten --num_devices) fails loudly instead of silently
        # running single-device
        raise ValueError(f"unknown parallel strategy {parallel!r}")
    if num_devices > 1:
        from gen3c_tpu.parallel.mesh import make_mesh

        if cfg_match:
            # CFG parallelism: cond/uncond forwards on different ranks,
            # combined by one psum per denoise step (parallel/cp.py +
            # sampler cfg_axis) — optionally x cp / tp on more chips,
            # e.g. "cfg2" on 2 chips, "cfg2cp2" on 4, "cfg2cp2tp2" on 8
            cp_n = int(cfg_match.group(1) or 1)
            tp_n = int(cfg_match.group(2) or 1)
            if 2 * cp_n * tp_n != num_devices:
                raise ValueError(
                    f"parallel={parallel!r} needs {2 * cp_n * tp_n} "
                    f"devices, got num_devices={num_devices}"
                )
            mesh = make_mesh(dp=1, cfg=2, cp=cp_n, tp=tp_n,
                             devices=jax.devices()[:num_devices])
            log.info(
                f"CFG-parallel denoising (cond/uncond split): cfg=2"
                + (f" x cp={cp_n}" if cp_n > 1 else "")
                + (f" x tp={tp_n}" if tp_n > 1 else "")
            )
        elif parallel == "tp":
            # tensor-parallel serving: params sharded Megatron-style over
            # the devices (declarative PartitionSpecs, XLA inserts the
            # collectives); bf16 7B fits on >=2 chips without int8
            from gen3c_tpu.parallel.sharding import shard_params

            mesh = make_mesh(dp=1, cp=1, tp=num_devices,
                             devices=jax.devices()[:num_devices])
            dit_params = shard_params(mesh, dit_params)
            log.info(
                f"tensor-parallel denoising over {num_devices} devices"
            )
            mesh = None  # plain jit path: XLA auto-partitions
        elif parallel == "cp":
            mesh = make_mesh(dp=1, cp=num_devices, tp=1,
                             devices=jax.devices()[:num_devices])
            log.info(
                f"context-parallel denoising over {num_devices} devices"
            )
        else:
            # 2D cp x tp mesh, e.g. parallel="cp4tp2" on 8 chips: tokens
            # sharded over cp, heads/hidden Megatron-sharded over tp —
            # one shard_map runs both (parallel/cp.py). Latent T must
            # divide cp; num_heads must divide tp.
            cp_n = int(cp_tp_match.group(1))
            tp_n = int(cp_tp_match.group(2))
            use_sp = cp_tp_match.group(3) == "sp"
            if use_sp and tp_n < 2:
                raise ValueError(
                    "the 'sp' suffix (Megatron sequence parallelism) "
                    "needs tp>=2"
                )
            if cp_n * tp_n != num_devices:
                raise ValueError(
                    f"parallel={parallel!r} needs {cp_n * tp_n} devices, "
                    f"got num_devices={num_devices}"
                )
            if quantize:
                raise ValueError(
                    "cpNtpM serving is the bf16 multi-chip path; "
                    "combine with quantize=False"
                )
            mesh = make_mesh(dp=1, cp=cp_n, tp=tp_n,
                             devices=jax.devices()[:num_devices])
            log.info(
                f"2D context x tensor parallel denoising: cp={cp_n} "
                f"tp={tp_n}"
                + (" + sequence parallelism" if use_sp else "")
            )

    model = Gen3CModel(
        dit_params=dit_params,
        dit_cfg=dit_cfg,
        tokenizer=tokenizer,
        frame_buffer_max=preset.frame_buffer_max,
        chunk_size=preset.chunk_size,
        state_shape=preset.state_shape,
        mesh=mesh,
        sequence_parallel=use_sp,
        offload_dit=offload_dit and num_devices == 1,
        streaming_net=streaming_net,
    )
    # cold-start breakdown (VERDICT r4 next #5): the DiT acquisition is
    # the bandwidth-bound arm; everything else should hide under it —
    # a 'serial tail' much above ~15 s means a new serial stage crept in
    _t_end = _time.perf_counter()
    log.info(
        "build breakdown: dit-acquire %.1fs (overlapped) | vae+tokenizer "
        "%.1fs (parallel arm) | join-wait %.1fs | quantize/stage/mesh "
        "%.1fs | total %.1fs (serial tail beyond dit: %.1fs)"
        % (
            _dit_box.get("seconds", float("nan")),
            _t_vae_done - _t_build0,
            _t_dit_join - _t_vae_done,
            _t_end - _t_dit_join,
            _t_end - _t_build0,
            (_t_end - _t_build0) - _dit_box.get("seconds", 0.0),
        )
    )
    return model, preset


def build_tokenizer(preset, checkpoint_dir=None):
    """Build ONLY the video tokenizer (VAE) of a preset — for pipelines
    that need encode/decode without the 7B DiT (e.g. the multiview CLIs,
    which carry their own multiview DiT params). Implemented by swapping
    in a 1-block stub DiT before reusing the factory's VAE loading."""
    import types

    if isinstance(preset, str):
        preset = PRESETS[preset]
    stub = dataclasses.replace(
        preset,
        dit=dataclasses.replace(
            preset.dit, num_blocks=1, model_channels=64, num_heads=2,
            adaln_lora_dim=8,
        ),
    )
    full, p = build_gen3c_model(stub, checkpoint_dir=checkpoint_dir)
    return types.SimpleNamespace(encode=full.encode, decode=full.decode), p


def apply_perf_preset(args) -> None:
    """Expand --perf_preset into individual knobs (only where the user
    left the default, so explicit flags always win).

    "fast" is the measured single-chip fast configuration
    (docs/STATUS.md, 2026-08-19: 8.5 min generation for the 121-frame
    chunk): W8A8 quantization + temporal-band window 2 + step-cache
    interval 2 + guidance interval q=0.5 (sigma 1.75..81). "exact"
    (default) changes nothing.
    """
    if getattr(args, "perf_preset", "exact") != "fast":
        return
    if not (getattr(args, "quantize_w8a8", False)
            or getattr(args, "quantize_int8", False)):
        args.quantize_w8a8 = True
    if getattr(args, "attn_temporal_window", None) is None:
        args.attn_temporal_window = 2
    if getattr(args, "step_cache_interval", 1) <= 1 and not getattr(
            args, "step_cache_threshold", 0.0):
        args.step_cache_interval = 2
    if getattr(args, "guidance_interval", None) is None:
        args.guidance_interval = [1.75, 81.0]


def add_perf_flags(p) -> None:
    """Shared serving-performance CLI flags (the single-image CLI keeps
    its richer documented set; these mirror its semantics)."""
    p.add_argument("--perf_preset", choices=["exact", "fast"],
                   default="exact",
                   help="'fast' = the measured single-chip fast config "
                        "(W8A8 + band 2 + cache 2 + guidance interval "
                        "q0.5; 8.5 min/121-frame chunk) — explicit "
                        "flags still win; 'exact' changes nothing")
    p.add_argument("--quantize_int8", action="store_true",
                   help="int8 weight-only DiT (fits the 7B on one chip)")
    p.add_argument("--quantize_w8a8", action="store_true",
                   help="int8 weights + dynamic int8 activations")
    p.add_argument("--offload_diffusion_transformer", action="store_true")
    p.add_argument("--offload_tokenizer", action="store_true")
    p.add_argument("--step_cache_interval", type=int, default=1,
                   help=">1: training-free step caching")
    p.add_argument("--attn_temporal_window", type=int, default=None,
                   help="temporal-band sparse attention (opt-in; "
                        "measured 1.57x the 7B step at window 2)")
    p.add_argument("--guidance_interval", type=float, nargs=2,
                   default=None, metavar=("SIGMA_LO", "SIGMA_HI"),
                   help="restrict CFG to steps with sigma in [LO, HI] "
                        "(arXiv:2404.07724); cond-only forwards "
                        "(~half cost) outside the interval")
    p.add_argument("--cfg_rescale", type=float, default=0.0,
                   help="phi>0: CFG-rescale (arXiv:2305.08891)")
    p.add_argument("--cp_attn", type=str, default=None,
                   choices=["allgather", "ring", "ulysses"])
    p.add_argument("--parallel", type=str, default="cp")
    p.add_argument("--num_devices", "--num_gpus", type=int, default=1,
                   dest="num_devices")


def build_from_args(args, preset_name: Optional[str] = None):
    """build_gen3c_model from an add_perf_flags-style namespace, with
    the single-image CLI's 7B single-chip offload auto-enable."""
    apply_perf_preset(args)
    name = preset_name or args.model_preset
    offload = (
        args.offload_diffusion_transformer
        or (name == "gen3c_7b" and args.num_devices == 1)
    )
    return build_gen3c_model(
        name,
        checkpoint_dir=args.checkpoint_dir,
        seed=args.seed,
        num_devices=args.num_devices,
        parallel=args.parallel,
        quantize="w8a8" if args.quantize_w8a8 else args.quantize_int8,
        offload_dit=offload,
        offload_tokenizer=offload or args.offload_tokenizer,
        attn_temporal_window=args.attn_temporal_window,
        cp_attn=args.cp_attn,
    )
