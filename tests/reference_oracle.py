"""Load reference (torch CPU) modules from /root/reference as test oracles.

The reference geometry engine is pure torch and runs on CPU; we use it to
golden-test the JAX implementation. ``warp`` (NVIDIA Warp) is stubbed since
the reference only needs it lazily for the CUDA ray tracer.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name: str) -> types.ModuleType:
    if name not in sys.modules:
        mod = types.ModuleType(name)
        # a real ModuleSpec: importlib.util.find_spec (used by
        # transformers' lazy-import machinery) raises
        # "ValueError: <name>.__spec__ is None" on bare stub modules
        import importlib.machinery

        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    return sys.modules[name]


def stub_cuda_stack():
    """Stub warp / transformer_engine / megatron so that reference modules
    import under torch-CPU. Only the pieces touched at import time."""
    _stub("warp")
    te = _stub("transformer_engine")
    te_pt = _stub("transformer_engine.pytorch")
    te_attn = _stub("transformer_engine.pytorch.attention")
    import torch

    class _RMSNorm(torch.nn.Module):
        def __init__(self, dim, eps=1e-6):
            super().__init__()
            self.eps = eps
            self.weight = torch.nn.Parameter(torch.ones(dim))

        def forward(self, x):
            xf = x.float()
            var = xf.pow(2).mean(-1, keepdim=True)
            return (xf * torch.rsqrt(var + self.eps) * self.weight.float()).to(
                x.dtype
            )

    def _apply_rotary_pos_emb(t, freqs, tensor_format="sbhd", fused=True):
        # GPT-NeoX rotate-half over the full head dim, fp32 math
        # (TE apply_rotary_pos_emb parity for the duplicated-halves table).
        cos = torch.cos(freqs).to(torch.float32)  # (L,1,1,D)
        sin = torch.sin(freqs).to(torch.float32)
        d = t.shape[-1]
        t1, t2 = t[..., : d // 2], t[..., d // 2 :]
        rot = torch.cat([-t2, t1], dim=-1)
        return (t.float() * cos + rot.float() * sin).to(t.dtype)

    class _DotProductAttention(torch.nn.Module):
        def __init__(self, heads, dim_head, **kwargs):
            super().__init__()
            self.heads = heads
            self.dim_head = dim_head

        def forward(self, q, k, v, **kwargs):
            # qkv_format sbhd: (S, B, H, D) -> out (S, B, H*D)
            qb = q.permute(1, 2, 0, 3)
            kb = k.permute(1, 2, 0, 3)
            vb = v.permute(1, 2, 0, 3)
            out = torch.nn.functional.scaled_dot_product_attention(qb, kb, vb)
            s, b = q.shape[0], q.shape[1]
            return out.permute(2, 0, 1, 3).reshape(s, b, -1)

    te_pt.RMSNorm = _RMSNorm
    te_pt.attention = te_attn

    # peft probes te.pytorch.{LayerNormLinear, LayerNormMLP, Linear} via
    # isinstance() when the TE import "succeeds" (it does, via this
    # stub); give it real-but-never-matching classes so LoRA wrapping of
    # plain torch models keeps working after stub_cuda_stack ran
    class _NeverUsed(torch.nn.Module):
        pass

    te_pt.LayerNormLinear = _NeverUsed
    te_pt.LayerNormMLP = type("_NeverUsedMLP", (_NeverUsed,), {})
    te_pt.Linear = type("_NeverUsedLinear", (_NeverUsed,), {})
    te.pytorch = te_pt
    te_attn.DotProductAttention = _DotProductAttention
    te_attn.apply_rotary_pos_emb = _apply_rotary_pos_emb

    # bypass lazy-config (omegaconf/hydra not installed); only DataType and
    # class definitions are needed from conditioner.py
    if "cosmos_predict1.utils.lazy_config" not in sys.modules:
        lc = types.ModuleType("cosmos_predict1.utils.lazy_config")
        lc.instantiate = lambda cfg, *a, **k: cfg
        lc.LazyCall = lambda target: (lambda **kw: {"_target_": target, **kw})
        lc.LazyDict = dict
        sys.modules["cosmos_predict1.utils.lazy_config"] = lc

    # minimal loguru for modules that `from loguru import logger` directly
    if "loguru" not in sys.modules:
        from unittest import mock

        loguru = types.ModuleType("loguru")
        loguru.logger = mock.MagicMock()
        sys.modules["loguru"] = loguru

    # bypass the reference's loguru-based logger entirely
    if "cosmos_predict1.utils.log" not in sys.modules:
        log_stub = types.ModuleType("cosmos_predict1.utils.log")
        for fn in ("info", "debug", "warning", "error", "critical", "success"):
            setattr(log_stub, fn, lambda *a, **k: None)
        sys.modules["cosmos_predict1.utils.log"] = log_stub

    _stub("pynvml")
    # utils/misc.py (imported by training/conditioner.py) imports boto3 +
    # requests-retry plumbing at module scope
    _stub("boto3")
    _stub("botocore")
    _stub("botocore.config")

    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tv_t = _stub("torchvision.transforms")
        tv_f = _stub("torchvision.transforms.functional")

        class _Interp:
            NEAREST = "nearest"
            BILINEAR = "bilinear"

        def _resize(img, size, interpolation="nearest", **kw):
            mode = "nearest" if interpolation == "nearest" else "bilinear"
            added = False
            if img.dim() == 3:
                img, added = img[None], True
            out = torch.nn.functional.interpolate(img.float(), size=size, mode=mode)
            return (out[0] if added else out).to(img.dtype)

        tv_f.resize = _resize
        tv_t.functional = tv_f
        tv_t.InterpolationMode = _Interp
        tv.transforms = tv_t

    mc = _stub("megatron")
    mcore = _stub("megatron.core")

    class _ParallelState:
        @staticmethod
        def is_initialized():
            return False

        @staticmethod
        def get_tensor_model_parallel_rank():
            return 0

        @staticmethod
        def get_tensor_model_parallel_world_size():
            return 1

        @staticmethod
        def get_context_parallel_world_size():
            return 1

    mcore.parallel_state = _ParallelState()

    class _ModelParallelConfig:
        def __init__(self, *a, **k):
            for key, v in k.items():
                setattr(self, key, v)

    mcore.ModelParallelConfig = _ModelParallelConfig
    mc.core = mcore

    # megatron tensor-parallel modules (only the tp=1 code paths of the
    # reference AR stack are exercised; these stand in for the imports)
    mtp = _stub("megatron.core.tensor_parallel")

    class _TPModule(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    mtp.ColumnParallelLinear = _TPModule
    mtp.RowParallelLinear = _TPModule
    mtp.VocabParallelEmbedding = _TPModule
    mcore.tensor_parallel = mtp
    mappings = _stub("megatron.core.tensor_parallel.mappings")
    mappings.reduce_from_tensor_model_parallel_region = lambda x: x
    mappings.reduce_scatter_to_sequence_parallel_region = lambda x: x
    mtp.mappings = mappings
    tputils = _stub("megatron.core.tensor_parallel.utils")

    class _VocabUtility:
        @staticmethod
        def vocab_range_from_global_vocab_size(global_vocab_size, rank,
                                               world_size):
            per = global_vocab_size // world_size
            return rank * per, (rank + 1) * per

    tputils.VocabUtility = _VocabUtility
    mtp.utils = tputils


def stub_diffusers():
    """Stub ``diffusers.EDMEulerScheduler`` so the reference sampling-loop
    modules (model_t2w.py:17,65; model_v2w.py:121-149) import and run under
    torch-CPU. Semantics re-derived from the diffusers EDMEulerScheduler
    the reference constructs with (sigma_max=80, sigma_min=0.0002,
    sigma_data) — karras rho=7 sigma ramp with a trailing 0, c_noise
    timesteps 0.25*ln(sigma), init_noise_sigma (sigma_max^2+1)^0.5, EDM
    preconditioning, and the Euler step (the same derivation as
    gen3c_tpu/diffusion/scheduler.py, here in torch as the oracle)."""
    if "diffusers" in sys.modules:
        return
    import numpy as np
    import torch

    d = _stub("diffusers")

    class _StepOutput:
        def __init__(self, prev_sample):
            self.prev_sample = prev_sample

    class EDMEulerScheduler:
        def __init__(self, sigma_min=0.002, sigma_max=80.0, sigma_data=0.5,
                     rho=7.0, **kwargs):
            self.config = types.SimpleNamespace(
                sigma_min=sigma_min, sigma_max=sigma_max,
                sigma_data=sigma_data, rho=rho,
            )
            self._step_index = None

        @property
        def init_noise_sigma(self):
            return (self.config.sigma_max**2 + 1) ** 0.5

        def set_timesteps(self, num_inference_steps):
            ramp = np.linspace(0, 1, num_inference_steps)
            min_inv = self.config.sigma_min ** (1 / self.config.rho)
            max_inv = self.config.sigma_max ** (1 / self.config.rho)
            s = (max_inv + ramp * (min_inv - max_inv)) ** self.config.rho
            s = s.astype(np.float32)
            self.sigmas = torch.cat(
                [torch.from_numpy(s), torch.zeros(1)]
            )
            self.timesteps = 0.25 * torch.log(torch.from_numpy(s))
            self._step_index = None

        @property
        def step_index(self):
            return self._step_index

        def _init_step_index(self, timestep):
            idx = (self.timesteps == timestep).nonzero()
            self._step_index = int(idx[0].item())

        def precondition_inputs(self, sample, sigma):
            c_in = 1 / ((sigma**2 + self.config.sigma_data**2) ** 0.5)
            return sample * c_in

        def precondition_noise(self, sigma):
            # diffusers EDMEulerScheduler c_noise = 0.25 * ln(sigma)
            # (used by the diffusion decoder's latent_condition_sigma,
            # autoregressive/diffusion_decoder/model.py:236)
            if not torch.is_tensor(sigma):
                sigma = torch.tensor([sigma])
            return 0.25 * torch.log(sigma)

        def scale_model_input(self, sample, timestep):
            if self._step_index is None:
                self._init_step_index(timestep)
            return self.precondition_inputs(
                sample, self.sigmas[self._step_index]
            )

        def precondition_outputs(self, sample, model_output, sigma):
            sd = self.config.sigma_data
            c_skip = sd**2 / (sigma**2 + sd**2)
            c_out = sigma * sd / (sigma**2 + sd**2) ** 0.5
            return c_skip * sample + c_out * model_output

        def step(self, model_output, timestep, sample):
            if self._step_index is None:
                self._init_step_index(timestep)
            sigma = self.sigmas[self._step_index]
            sigma_next = self.sigmas[self._step_index + 1]
            denoised = self.precondition_outputs(sample, model_output, sigma)
            derivative = (sample - denoised) / sigma
            prev = sample + (sigma_next - sigma) * derivative
            self._step_index += 1
            return _StepOutput(prev)

    d.EDMEulerScheduler = EDMEulerScheduler

    # model_t2w imports LayerControlConfigParser, whose module imports
    # omegaconf for isinstance checks only. Ensure attributes
    # per-attribute (not per-module): another test may have registered a
    # leaner omegaconf stub first (test_ar_parity stubs only DictConfig/
    # OmegaConf), and skipping wholesale left ListConfig missing — the
    # full-suite-order-only failure of 2026-08-19.
    om = sys.modules.get("omegaconf") or _stub("omegaconf")

    class DictConfig(dict):
        pass

    class ListConfig(list):
        pass

    if not hasattr(om, "DictConfig"):
        om.DictConfig = DictConfig
    if not hasattr(om, "ListConfig"):
        om.ListConfig = ListConfig


def load_reference_geometry():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "warp" not in sys.modules:
        sys.modules["warp"] = types.ModuleType("warp")
    from cosmos_predict1.diffusion.inference import (  # noqa: E501
        camera_utils,
        forward_warp_utils_pytorch,
    )
    from cosmos_predict1.diffusion.inference import cache_3d

    return forward_warp_utils_pytorch, camera_utils, cache_3d
