"""TP checkpoint shard/merge parity vs the reference implementation
(autoregressive/utils/checkpoint.py:87-262) + round-trip identity."""

import numpy as np
import pytest
import torch

from gen3c_tpu.models.convert import (
    merge_ar_tp_state_dicts,
    shard_ar_tp_state_dict,
)
from tests.reference_oracle import stub_cuda_stack

N_HEADS, N_KV, DIM, CTX, HEAD_DIM, LAYERS = 8, 4, 32, 24, 4, 2


def _tiny_sd(seed=0):
    rng = np.random.RandomState(seed)

    def r(*shape):
        return rng.randn(*shape).astype(np.float32)

    sd = {
        "tok_embeddings.weight": r(64, DIM),
        "output.weight": r(64, DIM),
        "norm.weight": r(DIM),
    }
    for i in range(LAYERS):
        p = f"layers.{i}"
        sd.update({
            f"{p}.attention.wq.weight": r(N_HEADS * HEAD_DIM, DIM),
            f"{p}.attention.wk.weight": r(N_KV * HEAD_DIM, DIM),
            f"{p}.attention.wv.weight": r(N_KV * HEAD_DIM, DIM),
            f"{p}.attention.wo.weight": r(DIM, N_HEADS * HEAD_DIM),
            f"{p}.cross_attention.wq.weight": r(N_HEADS * HEAD_DIM, DIM),
            f"{p}.cross_attention.wk.weight": r(N_KV * HEAD_DIM, CTX),
            f"{p}.cross_attention.wv.weight": r(N_KV * HEAD_DIM, CTX),
            f"{p}.cross_attention.wo.weight": r(DIM, N_HEADS * HEAD_DIM),
            f"{p}.feed_forward.w1.weight": r(4 * DIM, DIM),
            f"{p}.feed_forward.w2.weight": r(DIM, 4 * DIM),
            f"{p}.feed_forward.w3.weight": r(4 * DIM, DIM),
            f"{p}.attention_norm.weight": r(DIM),
            f"{p}.ffn_norm.weight": r(DIM),
        })
    return sd


def _ref_fns():
    stub_cuda_stack()
    import sys

    sys.path.insert(0, "/root/reference")
    from cosmos_predict1.autoregressive.utils.checkpoint import (
        merge_tensor_parallel_state_dicts,
        obtain_tensor_parallel_state_dict,
    )

    return obtain_tensor_parallel_state_dict, merge_tensor_parallel_state_dicts


MODEL_CONFIG = {
    "n_heads": N_HEADS,
    "n_kv_heads": N_KV,
    "dim": DIM,
    "context_dim": CTX,
    "head_dim": HEAD_DIM,
    "n_layers": LAYERS,
}


class _Cfg(dict):
    __getattr__ = dict.__getitem__


@pytest.mark.parametrize("tp", [2, 4])
def test_shard_matches_reference(tp):
    ref_shard, _ = _ref_fns()
    sd = _tiny_sd()
    sd_torch = {k: torch.from_numpy(v) for k, v in sd.items()}
    for rank in range(tp):
        ours = shard_ar_tp_state_dict(
            sd, tp, rank, N_HEADS, N_KV, DIM, CTX)
        theirs = ref_shard(
            dict(sd_torch), tp, rank, _Cfg(MODEL_CONFIG))
        assert set(ours) == set(theirs)
        for k in ours:
            np.testing.assert_array_equal(
                ours[k], theirs[k].numpy(), err_msg=f"tp={tp} r={rank} {k}")


def test_merge_matches_reference_and_roundtrip():
    ref_shard, ref_merge = _ref_fns()
    sd = _tiny_sd()
    tp = 2
    shards = [shard_ar_tp_state_dict(sd, tp, r, N_HEADS, N_KV, DIM, CTX)
              for r in range(tp)]
    merged = merge_ar_tp_state_dicts(shards, N_HEADS, N_KV, DIM, CTX)
    # round-trip identity
    for k in sd:
        np.testing.assert_array_equal(merged[k], sd[k], err_msg=k)
    # merge parity vs the reference merger on the same shards
    ref_merged = ref_merge(
        [{k: torch.from_numpy(np.asarray(v)) for k, v in s.items()}
         for s in shards],
        _Cfg(MODEL_CONFIG),
    )
    assert set(ref_merged) == set(merged)
    for k in merged:
        np.testing.assert_allclose(
            merged[k], ref_merged[k].numpy(), atol=1e-6, err_msg=k)


def test_cli_roundtrip(tmp_path):
    import scripts.ar_tp_checkpoints as cli

    sd = _tiny_sd(3)
    base = str(tmp_path / "model.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, base)
    common = ["-c", base, "-t", "2", "--n_heads", str(N_HEADS),
              "--n_kv_heads", str(N_KV), "--dim", str(DIM),
              "--context_dim", str(CTX)]
    cli.main(["shard"] + common)
    out = str(tmp_path / "merged.pt")
    cli.main(["merge", "-o", out] + common)
    back = torch.load(out, map_location="cpu", weights_only=True)
    for k in sd:
        np.testing.assert_allclose(back[k].numpy(), sd[k], atol=1e-6)
