"""MAS aligner (models/aligner.py): forward-sum vs brute force, Viterbi vs a numpy
reference, padding/endpoint invariants, toy-alignment learning, and the
learn_alignment train path end-to-end."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gonova_tts_tpu.config import ModelConfig
from gonova_tts_tpu.models import aligner


def tiny_mcfg() -> ModelConfig:
    return ModelConfig(
        d_model=64, n_heads=2, d_ff=128, encoder_layers=1, decoder_layers=1,
        speaker_dim=32, upsample_initial_channel=32, vocos_dim=128, vocos_ff=256,
        vocos_layers=2, vocab_size=64, compute_dtype="float32",
    )


def _pad_logp(log_p_np, t_max, l_max):
    """Embed a [T_b, L_b] score matrix into static [1, t_max, l_max] + masks."""
    t_b, l_b = log_p_np.shape
    full = np.zeros((1, t_max, l_max), np.float32)
    full[0, :t_b, :l_b] = log_p_np
    tok_mask = np.zeros((1, l_max), np.float32)
    tok_mask[0, :l_b] = 1.0
    frm_mask = np.zeros((1, t_max), np.float32)
    frm_mask[0, :t_b] = 1.0
    return jnp.asarray(full), jnp.asarray(tok_mask), jnp.asarray(frm_mask)


def _mas_np(log_p, t_b, l_b):
    """Per-sample numpy Viterbi MAS (the standard host implementation — the jax
    scan version must match it exactly)."""
    best = np.full((t_b, l_b), -1e9, np.float64)
    best[0, 0] = log_p[0, 0]
    for t in range(1, t_b):
        for j in range(l_b):
            prev = best[t - 1, j]
            if j > 0 and best[t - 1, j - 1] > prev:
                prev = best[t - 1, j - 1]
            best[t, j] = log_p[t, j] + prev
    dur = np.zeros(l_b, np.int32)
    j = l_b - 1
    for t in range(t_b - 1, -1, -1):
        dur[j] += 1
        if t > 0 and j > 0 and best[t - 1, j - 1] > best[t - 1, j]:
            j -= 1
    return dur


def test_forward_sum_matches_bruteforce():
    """-loss*T must equal log sum over ALL monotonic paths (enumerated)."""
    rng = np.random.default_rng(0)
    t_b, l_b = 6, 3
    log_p = rng.standard_normal((t_b, l_b)).astype(np.float64)
    # Enumerate monotonic paths: token per frame, start 0, end l_b-1, step in {0,1}.
    totals = []
    for steps in itertools.product([0, 1], repeat=t_b - 1):
        path = np.cumsum((0,) + steps)
        if path[-1] != l_b - 1 or path.max() >= l_b:
            continue
        totals.append(sum(log_p[t, j] for t, j in enumerate(path)))
    expected = np.logaddexp.reduce(totals)

    lp, tok, frm = _pad_logp(log_p.astype(np.float32), t_max=9, l_max=5)
    loss = float(aligner.forward_sum_loss(lp, tok, frm))
    assert -loss * t_b == pytest.approx(expected, rel=1e-4)


def test_mas_matches_numpy_reference():
    rng = np.random.default_rng(1)
    t_max, l_max = 24, 10
    shapes = [(24, 10), (17, 5), (10, 3), (5, 5)]
    for t_b, l_b in shapes:
        log_p = rng.standard_normal((t_b, l_b)).astype(np.float32)
        lp, tok, frm = _pad_logp(log_p, t_max, l_max)
        dur = np.asarray(aligner.mas_durations(lp, tok, frm))[0]
        ref = _mas_np(log_p.astype(np.float64), t_b, l_b)
        np.testing.assert_array_equal(dur[:l_b], ref, err_msg=f"shape {(t_b, l_b)}")
        assert dur[l_b:].sum() == 0


def test_mas_durations_invariants():
    """Sum of durations == real frames; every valid token gets >= 1 frame (a
    monotonic path from token 0 to L-1 visits each once); batch-vectorized."""
    rng = np.random.default_rng(2)
    b, t_max, l_max = 4, 32, 12
    log_p = rng.standard_normal((b, t_max, l_max)).astype(np.float32)
    tok = np.zeros((b, l_max), np.float32)
    frm = np.zeros((b, t_max), np.float32)
    l_valid = [12, 7, 3, 1]
    t_valid = [32, 20, 12, 5]
    for i in range(b):
        tok[i, : l_valid[i]] = 1.0
        frm[i, : t_valid[i]] = 1.0
    dur = np.asarray(
        aligner.mas_durations(jnp.asarray(log_p), jnp.asarray(tok), jnp.asarray(frm))
    )
    for i in range(b):
        assert dur[i].sum() == t_valid[i], i
        assert (dur[i, : l_valid[i]] >= 1).all(), i
        assert dur[i, l_valid[i]:].sum() == 0, i


def test_token_pitch_pooling():
    pitch = jnp.asarray([[1.0, 1.0, 2.0, 2.0, 2.0, 9.0]])  # last frame invalid
    dur = jnp.asarray([[2, 3, 0]], jnp.int32)
    frm = jnp.asarray([[1.0, 1.0, 1.0, 1.0, 1.0, 0.0]])
    out = np.asarray(aligner.token_pitch(pitch, dur, frm))[0]
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(2.0)
    assert out[2] == pytest.approx(0.0)  # no frames → 0, not NaN


@pytest.mark.slow
def test_aligner_learns_toy_alignment():
    """Train ONLY the aligner with forward-sum on a toy corpus of permuted token
    sequences where each token TYPE has a fixed mel prototype and duration:
    MAS must recover the type durations. (Cross-utterance token reuse is what
    makes the alignment identifiable — a single utterance of unique tokens
    admits any monotonic segmentation at zero loss.)"""
    import optax

    cfg = tiny_mcfg()
    rng = np.random.default_rng(3)
    n_types, n_mels = 6, cfg.n_mels
    type_dur = np.asarray([2, 3, 4, 5, 6, 3], np.int32)
    protos = rng.standard_normal((n_types, n_mels)).astype(np.float32) * 2.0
    b, l_b = 8, 6
    seqs = np.stack([rng.permutation(n_types) for _ in range(b)])
    t_max = int(type_dur.max() * l_b)
    mel = np.zeros((b, t_max, n_mels), np.float32)
    frm = np.zeros((b, t_max), np.float32)
    for i in range(b):
        parts = [np.tile(protos[ty], (type_dur[ty], 1)) for ty in seqs[i]]
        m = np.concatenate(parts)
        m = m + 0.05 * rng.standard_normal(m.shape).astype(np.float32)
        mel[i, : len(m)] = m
        frm[i, : len(m)] = 1.0

    tok = jnp.asarray(seqs + 5)
    tok_mask = jnp.ones((b, l_b), jnp.float32)
    mel_j = jnp.asarray(mel)
    frm_mask = jnp.asarray(frm)

    params = aligner.init(jax.random.PRNGKey(0), cfg, dim=32)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            lp = aligner.log_probs(p, tok, mel_j, tok_mask, frame_mask=frm_mask)
            return aligner.forward_sum_loss(lp, tok_mask, frm_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = None
    for i in range(600):
        params, opt_state, loss = step(params, opt_state)
        if i == 0:
            loss0 = float(loss)
    assert float(loss) < loss0
    lp = aligner.log_probs(params, tok, mel_j, tok_mask, frame_mask=frm_mask)
    dur = np.asarray(aligner.mas_durations(lp, tok_mask, frm_mask))
    true = np.stack([type_dur[seqs[i]] for i in range(b)])
    err = np.abs(dur - true)
    # Interior frames resolve exactly; boundaries blur by the mel conv receptive
    # field (±2 frames) at most.
    assert err.max() <= 2, (dur, true)
    assert err.mean() <= 1.0, err.mean()


@pytest.mark.slow
def test_tts_loss_fn_learn_alignment_end_to_end(tmp_path):
    """The full learn_alignment train step: collate (pitch_frames, no durations) →
    aligner losses + MAS-supervised acoustic/vocoder — finite loss and grads."""
    from gonova_tts_tpu.models import tts
    from gonova_tts_tpu.train import step as tstep
    from gonova_tts_tpu.train.data import make_batch, prepare_example
    from gonova_tts_tpu.utils import write_wav

    cfg = tiny_mcfg()
    sr = 24000
    rng = np.random.default_rng(4)
    t = np.arange(int(1.0 * sr)) / sr
    audio = (0.4 * np.sin(2 * np.pi * 150 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))).astype(
        np.float32
    )
    path = str(tmp_path / "a.wav")
    write_wav(path, audio, sr)
    ex = prepare_example(path, "Align this text.", cfg)
    batch = make_batch([ex], cfg, token_buckets=(32,), learn_alignment=True)
    assert "pitch_frames" in batch
    assert batch["durations"].sum() == 0
    assert batch["frame_mask"].sum() > 0

    params = tts.init(jax.random.PRNGKey(0), cfg, with_aligner=True)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    (loss, metrics), grads = jax.value_and_grad(tstep.tts_loss_fn, has_aux=True)(
        params, batch_j, cfg, jnp.float32, True
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["align_fs"]))
    assert np.isfinite(float(metrics["align_bin"]))
    # Aligner params receive gradient.
    g = jax.tree_util.tree_leaves(grads["aligner"])
    assert any(float(jnp.abs(x).sum()) > 0 for x in g)


@pytest.mark.slow
def test_resident_gan_chunk_runs():
    """Device-resident GAN chunk (fori_loop d/g pairs): finite metrics, vocoder
    params move, EMA tracks — at minimal shapes (the on-chip demo uses the same
    code at scale)."""
    import optax

    from gonova_tts_tpu.models import tts, vocoder
    from gonova_tts_tpu.train import step as tstep

    cfg = tiny_mcfg()
    rng = np.random.default_rng(6)
    t_frames = 8
    batches = [
        {
            "mel": rng.standard_normal((2, t_frames, cfg.n_mels)).astype(np.float32),
            "audio": 0.1 * rng.standard_normal((2, t_frames * 256)).astype(np.float32),
            "frame_mask": np.ones((2, t_frames), np.float32),
        }
        for _ in range(2)
    ]
    params = tts.init(jax.random.PRNGKey(0), cfg)
    gen_params = {"vocoder": params["vocoder"]}
    disc_params = {
        "mpd": vocoder.mpd_init(jax.random.PRNGKey(1), width=0.25),
        "msd": vocoder.msd_init(jax.random.PRNGKey(2), width=0.25),
    }
    g_opt = optax.adam(1e-4)
    d_opt = optax.adam(1e-4)
    gen_state = tstep.init_state(gen_params, g_opt)
    disc_state = tstep.init_state(disc_params, d_opt)
    run_chunk, corpus = tstep.make_resident_gan_chunk(
        cfg, g_opt, d_opt, batches, chunk=2
    )
    ema = tstep.ema_init(gen_state.params)
    before = np.asarray(jax.tree_util.tree_leaves(gen_state.params)[0]).copy()
    gen_state, disc_state, ema, metrics = run_chunk(
        gen_state, disc_state, ema, jnp.zeros((), jnp.int32), corpus
    )
    for k in ("d", "adv", "fm", "mel"):
        assert np.isfinite(float(metrics[k])), (k, metrics)
    after = np.asarray(jax.tree_util.tree_leaves(gen_state.params)[0])
    assert not np.allclose(before, after)  # generator actually updated
    e = np.asarray(jax.tree_util.tree_leaves(ema)[0])
    assert np.isfinite(e).all()


@pytest.mark.slow
def test_gan_phase_runs_and_checkpoints(tmp_path):
    """train(gan=True): joint phase then adversarial vocoder fine-tune; metrics
    finite, checkpoint restores with the GAN-phase vocoder (VERDICT r2 #1)."""
    from gonova_tts_tpu.config import Config
    from gonova_tts_tpu.train.checkpoint import restore_params
    from gonova_tts_tpu.train.loop import train
    from gonova_tts_tpu.utils import write_wav

    sr = 24000
    rng = np.random.default_rng(5)
    tmp = tmp_path
    lines = []
    for i, text in enumerate(["Short gan test.", "Second sentence here."]):
        t = np.arange(int(1.0 * sr)) / sr
        audio = (0.4 * np.sin(2 * np.pi * (140 + 30 * i) * t)).astype(np.float32)
        p = str(tmp / f"g{i}.wav")
        write_wav(p, audio, sr)
        lines.append(f"{p}|{text}")
    mpath = str(tmp / "m.txt")
    with open(mpath, "w") as f:
        f.write("\n".join(lines) + "\n")

    cfg = Config()
    cfg.model = tiny_mcfg()
    metrics = train(
        config=cfg, manifest=mpath, steps=2, batch_size=2, lr=1e-4,
        checkpoint_dir=str(tmp / "ckpt"), checkpoint_every=100,
        gan=True, gan_steps=2, gan_lr=1e-4,
    )
    for k in ("gan_d", "gan_adv", "gan_fm", "gan_mel"):
        assert k in metrics and np.isfinite(metrics[k]), (k, metrics)
    restored = restore_params(str(tmp / "ckpt"))
    assert "vocoder" in restored and "aligner" not in restored


def test_resident_chunk_does_not_embed_corpus_in_hlo():
    """Regression (round 4, tunnel HTTP 413): the resident trainers must take the
    stacked corpus as a jit ARGUMENT — a closure capture becomes a constant
    embedded in the serialized HLO, whose size then scales with the corpus and
    overflows the remote compiler's request-body limit at the 944-utterance
    generalization corpus. Pin: the lowered module text stays orders of magnitude
    smaller than the corpus bytes."""
    import optax

    from gonova_tts_tpu.models import tts, vocoder
    from gonova_tts_tpu.train import step as tstep

    cfg = tiny_mcfg()
    rng = np.random.default_rng(9)
    t_frames = 8

    def make(n_batches):
        batches = [
            {
                "mel": rng.standard_normal((2, t_frames, cfg.n_mels)).astype(np.float32),
                "audio": 0.1 * rng.standard_normal((2, t_frames * 256)).astype(np.float32),
                "frame_mask": np.ones((2, t_frames), np.float32),
            }
            for _ in range(n_batches)
        ]
        params = tts.init(jax.random.PRNGKey(0), cfg)
        gen_params = {"vocoder": params["vocoder"]}
        disc_params = {
            "mpd": vocoder.mpd_init(jax.random.PRNGKey(1), width=0.25),
            "msd": vocoder.msd_init(jax.random.PRNGKey(2), width=0.25),
        }
        g_opt = optax.adam(1e-4)
        d_opt = optax.adam(1e-4)
        gen_state = tstep.init_state(gen_params, g_opt)
        disc_state = tstep.init_state(disc_params, d_opt)
        run_chunk, corpus = tstep.make_resident_gan_chunk(
            cfg, g_opt, d_opt, batches, chunk=1
        )
        ema = tstep.ema_init(gen_state.params)
        lowered = run_chunk.lower(
            gen_state, disc_state, ema, jnp.zeros((), jnp.int32), corpus
        )
        bytes_ = sum(int(np.asarray(v).nbytes) for v in corpus.values())
        return len(lowered.as_text()), bytes_

    hlo_small, corpus_small = make(4)
    hlo_big, corpus_big = make(64)
    grown = corpus_big - corpus_small  # ~1.3 MB of extra corpus data
    assert grown > 1_000_000
    # Fixed model constants (iDFT bases etc.) dominate the module text either
    # way; the pin is that the module must NOT grow with the corpus (closure
    # capture would add ~10x the extra corpus bytes as decimal literals).
    assert hlo_big - hlo_small < grown / 10, (
        f"HLO grew {hlo_big - hlo_small} B for {grown} B more corpus - corpus "
        "constants are being embedded in the compile payload again"
    )
