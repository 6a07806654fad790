"""Phase-wise param offloading (utils/offload.py): staging must not
change any numerics, and staged device buffers must actually be freed.

Reference parity: --offload_diffusion_transformer / --offload_tokenizer
(inference_utils.py:53-170, gen3c_pipeline.py:186-225).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _tiny_model(offload_dit=False, offload_tokenizer=False):
    from gen3c_tpu.pipelines.factory import build_gen3c_model

    return build_gen3c_model(
        "gen3c_tiny",
        checkpoint_dir=None,
        seed=0,
        offload_dit=offload_dit,
        offload_tokenizer=offload_tokenizer,
    )


def _generate(model, preset, seed=3):
    rng = np.random.RandomState(seed)
    chunk = preset.chunk_size
    h, w = preset.height, preset.width
    frames = jnp.asarray(rng.rand(1, 3, 1, h, w) * 2 - 1, jnp.float32)
    warps = jnp.asarray(
        rng.rand(1, chunk, 1, 3, h, w) * 2 - 1, jnp.float32
    )
    masks = jnp.asarray(
        (rng.rand(1, chunk, 1, 1, h, w) > 0.3), jnp.float32
    )
    cond_latent = model.create_condition_latent_from_input_frames(frames)
    t5 = jnp.asarray(rng.rand(1, 8, 1024), jnp.float32)
    samples = model.generate_samples(
        t5_embeddings=t5,
        condition_latent=cond_latent,
        condition_state=warps,
        condition_state_mask=masks,
        num_steps=3,
        seed=seed,
    )
    return np.asarray(model.decode(samples))


def test_offload_numerical_parity():
    """The offloaded configuration (host-resident params + host-loop
    sampler) must reproduce the resident fori_loop path. Tolerance is
    program-level float noise (different jit boundaries), not bitwise."""
    model_a, preset = _tiny_model()
    out_a = _generate(model_a, preset)
    model_b, _ = _tiny_model(offload_dit=True, offload_tokenizer=True)
    assert model_b.offload_dit and model_b.tokenizer.offload
    # offloaded params rest off-device: client-side numpy, or jax arrays
    # in the device-adjacent pinned_host memory when the backend has one
    def _off_device(leaf):
        if isinstance(leaf, np.ndarray):
            return True
        mk = getattr(getattr(leaf, "sharding", None), "memory_kind", None)
        return mk == "pinned_host"

    assert all(
        _off_device(leaf) for leaf in jax.tree.leaves(model_b.dit_params)
    )
    out_b = _generate(model_b, preset)
    assert out_a.shape == out_b.shape
    np.testing.assert_allclose(
        out_b.astype(np.float32), out_a.astype(np.float32),
        rtol=1e-4, atol=1e-4,
    )


def test_staged_releases_buffers():
    from gen3c_tpu.utils.offload import staged, tree_to_host

    tree = {"w": np.ones((16, 16), np.float32)}
    with staged(tree, enabled=True, tag="test") as dev:
        leaves = jax.tree.leaves(dev)
        assert all(isinstance(x, jax.Array) for x in leaves)
        float(jnp.sum(leaves[0]))  # usable on device
    assert all(x.is_deleted() for x in leaves)

    # enabled=False passes the tree through untouched
    with staged(tree, enabled=False) as same:
        assert same is tree

    host = tree_to_host({"a": jnp.ones((2,)), "b": 3})
    a = host["a"]
    mk = getattr(getattr(a, "sharding", None), "memory_kind", None)
    assert isinstance(a, np.ndarray) or mk == "pinned_host"
    assert int(np.asarray(host["b"])) == 3


def test_free_warp_buffers_ownership():
    """generate(free_warp_buffers=True) deletes the caller's
    device-resident warp arrays in offload mode (HBM freed before the
    denoise loop); default keeps caller arrays alive."""
    from gen3c_tpu.pipelines.gen3c_pipeline import Gen3cPipeline

    model, preset = _tiny_model(offload_dit=True, offload_tokenizer=True)
    pipe = Gen3cPipeline(model=model, num_steps=2,
                         height=preset.height, width=preset.width)
    rng = np.random.RandomState(0)
    chunk, h, w = preset.chunk_size, preset.height, preset.width
    frames = (rng.rand(1, 3, 1, h, w) * 2 - 1).astype(np.float32)

    def warps():
        return (
            jnp.asarray(rng.rand(1, chunk, 1, 3, h, w) * 2 - 1,
                        jnp.float32),
            jnp.asarray((rng.rand(1, chunk, 1, 1, h, w) > 0.3),
                        jnp.float32),
        )

    wi, wm = warps()
    out = pipe.generate("p", frames, wi, wm)
    assert out is not None
    assert not wi.is_deleted() and not wm.is_deleted()  # default: kept

    wi, wm = warps()
    out = pipe.generate("p", frames, wi, wm, free_warp_buffers=True)
    assert out is not None
    assert wi.is_deleted() and wm.is_deleted()  # ownership transferred
