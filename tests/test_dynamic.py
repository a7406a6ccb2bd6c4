"""Dynamic-inference kernels: gating, motion scores, streaming early exit."""
import jax
import jax.numpy as jnp
import numpy as np

from ssl_vit_video_analytics_tpu.models.dynamic import (
    motion_scores_l1, select_topk_frames, streaming_early_exit)


def test_motion_scores():
    B, T = 2, 5
    clip = jnp.zeros((B, T, 8, 8, 3))
    clip = clip.at[:, 3].set(1.0)  # big change at frame 3 (and back at 4)
    s = motion_scores_l1(clip)
    assert s.shape == (B, T)
    assert float(s[0, 0]) == 0.0
    assert float(s[0, 3]) == 1.0 and float(s[0, 4]) == 1.0
    assert float(s[0, 1]) == 0.0


def test_select_topk_frames_motion_and_random():
    B, T = 2, 6
    clip = jnp.arange(B * T * 4 * 4 * 3, dtype=jnp.float32).reshape(B, T, 4, 4, 3)
    sel, idx = select_topk_frames(clip, 3, score_type="motion")
    assert sel.shape == (B, 3, 4, 4, 3)
    assert (np.diff(np.asarray(idx), axis=1) > 0).all()  # ascending order
    sel_r, idx_r = select_topk_frames(clip, 3, score_type="random", key=jax.random.key(0))
    assert sel_r.shape == (B, 3, 4, 4, 3)
    # gathered frames match indices
    np.testing.assert_allclose(np.asarray(sel[0, 0]), np.asarray(clip[0, int(idx[0, 0])]))


def test_streaming_early_exit_semantics():
    """Linear embed/classify so exits are analytically predictable."""
    B, T, D, K = 3, 6, 4, 2

    # frame t of sample b has embedding e_b * (t+1 dependent) — make sample 0
    # instantly confident, sample 2 never confident.
    def embed_fn(frames):  # frames [B, 1] pseudo-images
        return frames[:, 0, 0, :]  # [B, D]

    def classify_fn(emb):
        w = jnp.zeros((D, K)).at[0, 0].set(1.0).at[1, 1].set(1.0)
        return emb @ w

    clip = np.zeros((B, T, 1, 1, D), np.float32)
    clip[0, :, 0, 0, 0] = 100.0   # sample 0: logit gap huge -> conf ~1
    clip[1, :, 0, 0, 0] = 2.0     # sample 1: moderate conf
    clip[2, :, 0, 0, :2] = 1.0    # sample 2: equal logits -> conf 0.5
    logits, stats = jax.jit(
        lambda c: streaming_early_exit(embed_fn, classify_fn, c, 0.9,
                                       min_frames=2, max_frames=5))(jnp.asarray(clip))
    used = np.asarray(stats.used_frames)
    conf = np.asarray(stats.final_conf)
    assert logits.shape == (B, K)
    assert used[0] == 2          # exits at min_frames
    assert used[2] == 5          # never exits -> max_frames
    assert conf[0] > 0.99 and abs(conf[2] - 0.5) < 1e-5
    # all-decided-early batch: loop must not run past T
    clip_all = np.zeros((B, T, 1, 1, D), np.float32)
    clip_all[:, :, 0, 0, 0] = 100.0
    _, st2 = jax.jit(
        lambda c: streaming_early_exit(embed_fn, classify_fn, c, 0.9,
                                       min_frames=1))(jnp.asarray(clip_all))
    assert (np.asarray(st2.used_frames) == 1).all()


def test_batched_early_exit_matches_streaming():
    """early_exit_batched is a TPU-first reformulation of the streaming loop:
    identical used_frames / final_conf / logits at every knob setting (the
    prefix sums replay the streaming adds in the same order and dtype)."""
    from ssl_vit_video_analytics_tpu.models.dynamic import early_exit_batched

    B, T, D, K = 5, 7, 6, 3
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(D, K)).astype(np.float32))

    def embed_fn(frames):  # [N, 1, 1, D] pseudo-images -> [N, D]
        return jnp.tanh(frames[:, 0, 0, :] * 1.7)

    def classify_fn(emb):
        return emb @ w

    clip = jnp.asarray(rng.normal(size=(B, T, 1, 1, D)).astype(np.float32) * 2)
    for thr, mf, mx, fs in [(0.0, 1, None, 1), (0.35, 2, None, 1),
                            (0.6, 4, 5, 2), (0.99, 3, None, 3),
                            (1.01, 1, None, 1)]:  # 1.01: nobody ever exits
        lg_s, st_s = jax.jit(lambda c, t=thr, m=mf, x=mx, f=fs: streaming_early_exit(
            embed_fn, classify_fn, c, t, min_frames=m, max_frames=x,
            frame_step=f))(clip)
        lg_b, st_b = jax.jit(lambda c, t=thr, m=mf, x=mx, f=fs: early_exit_batched(
            embed_fn, classify_fn, c, t, min_frames=m, max_frames=x,
            frame_step=f))(clip)
        np.testing.assert_array_equal(np.asarray(st_s.used_frames),
                                      np.asarray(st_b.used_frames),
                                      err_msg=f"thr={thr} mf={mf} mx={mx} fs={fs}")
        np.testing.assert_allclose(np.asarray(lg_s), np.asarray(lg_b),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_s.final_conf),
                                   np.asarray(st_b.final_conf), rtol=0, atol=1e-6)
