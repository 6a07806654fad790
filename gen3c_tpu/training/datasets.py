"""Training datasets: GEN3C RGBD clips -> diffusion training batches.

Parity: diffusion/training/datasets/dataset_3D.py + dataset_video.py —
the reference trains from (video, depth, poses, intrinsics) clips plus
precomputed T5 embedding pickles; per sample it renders warped condition
buffers from the 3D cache at the clip's own cameras and encodes
everything to latents. Here the same preprocessing runs through the JAX
cache + tokenizer, producing batches in the train_step format:

  x0             (B, 16, T', H', W')   clean video latent (sigma_data-scaled)
  crossattn_emb  (B, 512, 1024)        T5 embedding (or zeros)
  extra_channels (B, 65, T', H', W')   [condition mask | pose latents]
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

import numpy as np

import jax.numpy as jnp

from gen3c_tpu.utils import log


def _to_signed_range(video: np.ndarray, path: str) -> np.ndarray:
    """Normalize pixel ranges to [-1, 1]: uint8-style [0, 255] is scaled,
    unsigned [0, 1] is shifted (a silent half-range feed to the VAE is a
    training-corrupting bug), signed data passes through."""
    if video.max() > 1.5:
        return video / 127.5 - 1.0
    if video.min() >= 0.0 and video.max() <= 1.0:
        log.warning(f"{path}: frames look [0, 1]-normalized; mapping to "
                    "[-1, 1]")
        return video * 2.0 - 1.0
    return video


def build_gen3c_train_batch(
    model,
    image: np.ndarray,  # (F, 3, H, W) in [-1, 1]
    depth: np.ndarray,  # (F, 1, H, W)
    w2c: np.ndarray,  # (F, 4, 4)
    intrinsics: np.ndarray,  # (F, 3, 3)
    t5_embedding: Optional[np.ndarray] = None,  # (512, 1024)
    mask: Optional[np.ndarray] = None,
    num_condition_t: int = 1,
    seed: int = 0,
) -> dict:
    """One training sample from an RGBD clip (dataset_3D sample parity):
    the clip's first frame seeds a Cache3DBuffer, the clip's own cameras
    render the warp buffers, everything is VAE-encoded."""
    from gen3c_tpu.cache import Cache3DBuffer

    F = image.shape[0]
    assert F == model.chunk_size, (F, model.chunk_size)

    cache = Cache3DBuffer(
        frame_buffer_max=model.frame_buffer_max,
        seed=seed,
        input_image=jnp.asarray(image[:1]),
        input_depth=jnp.asarray(depth[:1]),
        input_mask=jnp.asarray(mask[:1]) if mask is not None else None,
        input_w2c=jnp.asarray(w2c[:1]),
        input_intrinsics=jnp.asarray(intrinsics[:1]),
    )
    warp_images, warp_masks = cache.render_cache(
        jnp.asarray(w2c[None]), jnp.asarray(intrinsics[None])
    )

    video = jnp.asarray(image.transpose(1, 0, 2, 3)[None])  # (1,3,F,H,W)
    x0 = model.encode(video)
    pose_latent = model.encode_warped_frames(warp_images, warp_masks)

    C, T, Hl, Wl = x0.shape[1:]
    indicator = jnp.zeros((1, 1, T, 1, 1), x0.dtype)
    indicator = indicator.at[:, :, :num_condition_t].set(1.0)
    in_mask = jnp.broadcast_to(indicator, (1, 1, T, Hl, Wl))
    extra = jnp.concatenate([in_mask, pose_latent.astype(x0.dtype)], axis=1)

    if t5_embedding is None:
        t5_embedding = np.zeros((512, 1024), np.float32)
    return {
        "x0": x0.astype(jnp.float32),
        "crossattn_emb": jnp.asarray(t5_embedding[None], jnp.float32),
        "extra_channels": extra.astype(jnp.float32),
    }


class Gen3CClipDataset:
    """Iterate training batches over a directory of packaged clips.

    Layout: <root>/*.npz (data_loaders packaged format) with optional
    sibling <clip>.t5.npy embedding files (the precompute pattern of
    scripts/get_t5_embeddings.py).
    """

    def __init__(self, root: str, model, batch_size: int = 1, seed: int = 0):
        self.root = root
        self.model = model
        self.batch_size = batch_size
        self.clips: List[str] = sorted(
            os.path.join(root, f)
            for f in os.listdir(root)
            if f.endswith((".npz", ".pt")) and not f.endswith(".t5.npy")
        )
        assert self.clips, f"no clips under {root}"
        self.rng = np.random.RandomState(seed)
        log.info(f"Gen3CClipDataset: {len(self.clips)} clips in {root}")

    def _load_sample(self, path: str) -> dict:
        from gen3c_tpu.pipelines.data_loaders import load_data_packaged_format

        image, depth, mask, w2c, k = load_data_packaged_format(path)
        t5 = None
        t5_path = os.path.splitext(path)[0] + ".t5.npy"
        if os.path.exists(t5_path):
            t5 = np.load(t5_path)
        chunk = self.model.chunk_size
        assert image.shape[0] >= chunk, (image.shape, chunk)
        start = self.rng.randint(0, image.shape[0] - chunk + 1)
        sl = slice(start, start + chunk)
        return build_gen3c_train_batch(
            self.model,
            image[sl],
            depth[sl],
            w2c[sl],
            k[sl],
            t5_embedding=t5,
            mask=mask[sl] if mask is not None else None,
            seed=int(self.rng.randint(0, 2**31)),
        )

    def __iter__(self) -> Iterator[dict]:
        while True:
            picks = self.rng.choice(len(self.clips), self.batch_size)
            samples = [self._load_sample(self.clips[i]) for i in picks]
            yield {
                k: jnp.concatenate([s[k] for s in samples], axis=0)
                for k in samples[0]
            }


class VideoClipDataset:
    """Text/video-to-world training clips (dataset_video.py parity: mp4 or
    packaged video + precomputed T5 embedding pickles -> latent batches).

    Layout: <root>/*.{mp4,npz} with optional sibling <clip>.t5.npy.
    num_condition_t=0 -> t2w batches (no condition channels);
    num_condition_t>0 -> v2w batches (first-n-latent-frame condition-mask
    channel, extend_model.py conditioning parity).
    """

    def __init__(self, root: str, model, batch_size: int = 1, seed: int = 0,
                 num_condition_t: int = 0):
        self.root = root
        self.model = model
        self.batch_size = batch_size
        self.num_condition_t = num_condition_t
        self.clips: List[str] = sorted(
            os.path.join(root, f)
            for f in os.listdir(root)
            if f.endswith((".mp4", ".npz")) and not f.endswith(".t5.npy")
        )
        assert self.clips, f"no clips under {root}"
        self.rng = np.random.RandomState(seed)
        log.info(f"VideoClipDataset: {len(self.clips)} clips in {root}")

    def _load_video(self, path: str) -> np.ndarray:
        """(F, 3, H, W) in [-1, 1]."""
        if path.endswith(".npz"):
            data = np.load(path)
            video = data["video"].astype(np.float32)  # (F, 3, H, W) or FHWC
            if video.shape[-1] == 3:
                video = video.transpose(0, 3, 1, 2)
            return _to_signed_range(video, path)
        from gen3c_tpu.utils.io import read_video_bcthw

        video, _ = read_video_bcthw(path)
        return video[0].transpose(1, 0, 2, 3)  # (C,T,H,W) -> (T,C,H,W)

    def _sample(self, path: str) -> dict:
        video = self._load_video(path)
        chunk = self.model.chunk_size
        assert video.shape[0] >= chunk, (video.shape, chunk)
        start = self.rng.randint(0, video.shape[0] - chunk + 1)
        clip = video[start : start + chunk]
        x0 = self.model.encode(
            jnp.asarray(clip.transpose(1, 0, 2, 3)[None])
        )
        C, T, Hl, Wl = x0.shape[1:]
        if self.num_condition_t > 0:
            ind = jnp.zeros((1, 1, T, 1, 1), x0.dtype)
            ind = ind.at[:, :, : self.num_condition_t].set(1.0)
            extra = jnp.broadcast_to(ind, (1, 1, T, Hl, Wl))
        else:
            extra = jnp.zeros((1, 0, T, Hl, Wl), x0.dtype)
        t5_path = os.path.splitext(path)[0] + ".t5.npy"
        t5 = (np.load(t5_path) if os.path.exists(t5_path)
              else np.zeros((512, 1024), np.float32))
        return {
            "x0": x0.astype(jnp.float32),
            "crossattn_emb": jnp.asarray(t5[None], jnp.float32),
            "extra_channels": extra.astype(jnp.float32),
        }

    def __iter__(self) -> Iterator[dict]:
        while True:
            picks = self.rng.choice(len(self.clips), self.batch_size)
            samples = [self._sample(self.clips[i]) for i in picks]
            yield {
                k: jnp.concatenate([s[k] for s in samples], axis=0)
                for k in samples[0]
            }


class MultiviewClipDataset:
    """Multiview training clips (dataset_multiview.py parity): per sample
    V synchronized views stacked on the latent-T axis — the layout the
    multiview DiT consumes ((B, 16, V*T', H', W'), views folded on T).

    Layout: <root>/*.npz with "videos" (V, F, 3|HWC...) and optional
    sibling .t5.npy (per-view embeddings concatenated by the conditioner).
    """

    def __init__(self, root: str, model, n_views: int, batch_size: int = 1,
                 seed: int = 0):
        self.root = root
        self.model = model
        self.n_views = n_views
        self.batch_size = batch_size
        self.clips: List[str] = sorted(
            os.path.join(root, f)
            for f in os.listdir(root)
            if f.endswith(".npz") and not f.endswith(".t5.npy")
        )
        assert self.clips, f"no clips under {root}"
        self.rng = np.random.RandomState(seed)
        log.info(
            f"MultiviewClipDataset: {len(self.clips)} clips in {root}"
        )

    def _sample(self, path: str) -> dict:
        data = np.load(path)
        videos = data["videos"].astype(np.float32)  # (V, F, 3, H, W)
        if videos.shape[-1] == 3:
            videos = videos.transpose(0, 1, 4, 2, 3)
        videos = _to_signed_range(videos, path)
        V = self.n_views
        assert videos.shape[0] >= V, (videos.shape, V)
        chunk = self.model.chunk_size
        assert videos.shape[1] >= chunk, (videos.shape, chunk)
        start = self.rng.randint(0, videos.shape[1] - chunk + 1)
        latents = [
            self.model.encode(
                jnp.asarray(
                    videos[v, start : start + chunk].transpose(1, 0, 2, 3)[
                        None
                    ]
                )
            )
            for v in range(V)
        ]
        x0 = jnp.concatenate(latents, axis=2)  # views stacked on T
        C, T, Hl, Wl = x0.shape[1:]
        t5_path = os.path.splitext(path)[0] + ".t5.npy"
        t5 = (np.load(t5_path) if os.path.exists(t5_path)
              else np.zeros((512, 1024), np.float32))
        return {
            "x0": x0.astype(jnp.float32),
            "crossattn_emb": jnp.asarray(t5[None], jnp.float32),
            "extra_channels": jnp.zeros((1, 0, T, Hl, Wl), jnp.float32),
        }

    def __iter__(self) -> Iterator[dict]:
        while True:
            picks = self.rng.choice(len(self.clips), self.batch_size)
            samples = [self._sample(self.clips[i]) for i in picks]
            yield {
                k: jnp.concatenate([s[k] for s in samples], axis=0)
                for k in samples[0]
            }


class PrefetchIterator:
    """Background-thread batch prefetcher (the reference's DataLoader
    num_workers equivalent, utils/trainer.py dataloader path): the
    wrapped iterator's decode/IO runs in a worker thread while the
    training step executes, with a bounded queue (double buffering by
    default). Exceptions propagate to the consumer; close() (or GC)
    stops the worker."""

    _SENTINEL = object()

    def __init__(self, iterable, prefetch: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=max(1, prefetch))
        self._err = None
        self._stop = threading.Event()

        def worker():
            try:
                for item in iterable:
                    if self._stop.is_set():
                        return
                    self._q.put(item)
            except BaseException as e:  # noqa: BLE001
                self._err = e
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # drain so a blocked put() wakes up and sees the stop flag
        try:
            while True:
                self._q.get_nowait()
        except Exception:  # noqa: BLE001
            pass

    def __del__(self):
        self.close()
