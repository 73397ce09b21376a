"""Parallel + training tests on the 8-virtual-device CPU mesh: sharding rules,
dp/tp parity with single-device, loss functions, GAN steps, checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gonova_tts_tpu.config import ModelConfig
from gonova_tts_tpu.models import tts, vocoder
from gonova_tts_tpu.parallel import make_mesh, param_spec, param_shardings, shard_params
from gonova_tts_tpu.train import losses, restore_params, save_params
from gonova_tts_tpu.train import step as tstep


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(
        d_model=64,
        n_heads=2,
        d_ff=128,
        encoder_layers=1,
        decoder_layers=1,
        speaker_dim=32,
        upsample_initial_channel=32,
        vocos_dim=128,
        vocos_ff=256,
        vocos_layers=2,
        vocab_size=64,
    )


@pytest.fixture(scope="module")
def params(cfg):
    return tts.init(jax.random.PRNGKey(0), cfg)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        make_mesh(n_data=5, n_model=2)


def test_param_spec_rules():
    assert param_spec("acoustic/encoder/blocks/0/attn/q/w") == jax.sharding.PartitionSpec(None, "model")
    assert param_spec("acoustic/encoder/blocks/0/attn/o/w") == jax.sharding.PartitionSpec("model", None)
    assert param_spec("acoustic/encoder/blocks/0/ff1/w") == jax.sharding.PartitionSpec(None, None, "model")
    assert param_spec("acoustic/encoder/blocks/0/ln1/g") == jax.sharding.PartitionSpec()
    assert param_spec("acoustic/embed/table") == jax.sharding.PartitionSpec(None, "model")


def test_shard_params_places_on_mesh(cfg, params):
    mesh = make_mesh(n_data=4, n_model=2)
    placed = shard_params(params, mesh)
    qw = placed["acoustic"]["encoder"]["blocks"][0]["attn"]["q"]["w"]
    # 64-dim out sharded over 2 model devices → shards of width 32.
    shard_shapes = {s.data.shape for s in qw.addressable_shards}
    assert shard_shapes == {(64, 32)}
    ln = placed["acoustic"]["encoder"]["blocks"][0]["ln1"]["g"]
    assert ln.sharding.is_fully_replicated


@pytest.mark.slow
def test_forward_parity_single_vs_mesh(cfg, params):
    """The sharded forward must produce the same audio as single-device."""
    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, 60, (4, 16)), jnp.int32)
    mask = jnp.ones((4, 16), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((4, cfg.speaker_dim)), jnp.float32)
    exagg = jnp.full((4,), 0.5, jnp.float32)

    ref = tts.synthesize(params, tokens, mask, spk, exagg, cfg)

    placed = shard_params(params, mesh)
    from gonova_tts_tpu.parallel import batch_sharding

    t_sh = jax.device_put(tokens, batch_sharding(mesh, 2))
    m_sh = jax.device_put(mask, batch_sharding(mesh, 2))
    s_sh = jax.device_put(spk, batch_sharding(mesh, 2))
    e_sh = jax.device_put(exagg, batch_sharding(mesh, 1))
    fn = jax.jit(lambda p, t, m, s, e: tts.synthesize(p, t, m, s, e, cfg))
    out = fn(placed, t_sh, m_sh, s_sh, e_sh)
    np.testing.assert_allclose(
        np.asarray(out["audio"]), np.asarray(ref["audio"]), atol=2e-4
    )


@pytest.mark.slow
def test_sharded_train_step_runs_and_descends(cfg, params):
    opt = tstep.make_optimizer(lr=1e-4, warmup=1)
    state = tstep.init_state(params, opt)
    mesh = make_mesh(n_data=4, n_model=2)
    batch = tstep.synthetic_batch(cfg, batch=8, tokens=16)
    stepfn, pstate = tstep.make_sharded_train_step(cfg, opt, mesh, state, batch)
    losses_seen = []
    for _ in range(6):
        pstate, metrics = stepfn(pstate, batch)
        losses_seen.append(float(metrics["total"]))
    assert all(np.isfinite(losses_seen))
    assert losses_seen[-1] < losses_seen[0]  # optimizing a fixed batch must descend
    assert int(pstate.step) == 6


@pytest.mark.slow
def test_unsharded_train_step_matches_sharded(cfg, params):
    opt = tstep.make_optimizer(lr=1e-3, warmup=1)
    batch = tstep.synthetic_batch(cfg, batch=8, tokens=16)
    plain = tstep.make_train_step(cfg, opt)
    s1, m1 = plain(tstep.init_state(params, opt), batch)

    mesh = make_mesh(n_data=4, n_model=2)
    stepfn, pstate = tstep.make_sharded_train_step(cfg, opt, mesh, tstep.init_state(params, opt), batch)
    s2, m2 = stepfn(pstate, batch)
    assert abs(float(m1["total"]) - float(m2["total"])) < 1e-4


@pytest.mark.slow
def test_data_only_mesh(cfg, params):
    """Pure-dp mesh (model axis 1) must also work — the serving layout."""
    opt = tstep.make_optimizer(lr=1e-3, warmup=1)
    mesh = make_mesh(n_data=8, n_model=1)
    batch = tstep.synthetic_batch(cfg, batch=8, tokens=16)
    stepfn, pstate = tstep.make_sharded_train_step(cfg, opt, mesh, tstep.init_state(params, opt), batch)
    _, metrics = stepfn(pstate, batch)
    assert np.isfinite(float(metrics["total"]))


# ---------------------------------------------------------------- losses


def test_masked_losses_ignore_padding():
    pred = jnp.ones((2, 4, 3))
    target = jnp.zeros((2, 4, 3))
    mask_full = jnp.ones((2, 4))
    mask_half = jnp.asarray([[1, 1, 0, 0], [1, 1, 0, 0]], jnp.float32)
    assert float(losses.masked_l1(pred, target, mask_full)) == pytest.approx(1.0)
    # Scribble on masked region — loss unchanged.
    pred2 = pred.at[:, 2:].set(99.0)
    assert float(losses.masked_l1(pred2, target, mask_half)) == pytest.approx(1.0)


def test_duration_loss_zero_when_exact():
    dur = jnp.asarray([[2, 3, 1]], jnp.float32)
    log_dur = jnp.log(dur + 1.0)
    mask = jnp.ones((1, 3))
    assert float(losses.duration_loss(log_dur, dur, mask)) == pytest.approx(0.0, abs=1e-6)


@pytest.mark.slow
def test_mrstft_loss_zero_on_identical(rng):
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    assert float(losses.multi_resolution_stft_loss(x, x)) == pytest.approx(0.0, abs=1e-5)
    y = x * 0.5
    assert float(losses.multi_resolution_stft_loss(x, y)) > 0.01


@pytest.mark.slow
def test_gan_steps_run(cfg, params):
    g_opt = tstep.make_optimizer(lr=2e-4, warmup=1)
    d_opt = tstep.make_optimizer(lr=2e-4, warmup=1)
    d_step, g_step = tstep.make_gan_steps(cfg, g_opt, d_opt)
    disc_params = {
        "mpd": vocoder.mpd_init(jax.random.PRNGKey(1), width=0.25),
        "msd": vocoder.msd_init(jax.random.PRNGKey(2), width=0.25),
    }
    gen_state = tstep.init_state(params, g_opt)
    disc_state = tstep.init_state(disc_params, d_opt)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 16, cfg.n_mels)), jnp.float32)
    audio = jnp.asarray(0.1 * rng.standard_normal((2, 16 * 256)), jnp.float32)
    fmask = jnp.ones((2, 16), jnp.float32)
    disc_state, d_loss = d_step(disc_state, gen_state.params, mel, audio)
    gen_state, g_metrics = g_step(gen_state, disc_state.params, mel, audio, fmask)
    assert np.isfinite(float(d_loss))
    for v in g_metrics.values():
        assert np.isfinite(float(v))


@pytest.mark.slow
def test_sharded_gan_steps_match_single_device(cfg, params):
    """dp×tp GAN steps on the 4×2 mesh ≡ single-device steps (one step each)."""
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((4, 16, cfg.n_mels)), jnp.float32)
    audio = jnp.asarray(0.1 * rng.standard_normal((4, 16 * 256)), jnp.float32)
    fmask = jnp.ones((4, 16), jnp.float32)
    disc_params = {
        "mpd": vocoder.mpd_init(jax.random.PRNGKey(1), width=0.25),
        "msd": vocoder.msd_init(jax.random.PRNGKey(2), width=0.25),
    }

    def run_single():
        g_opt = tstep.make_optimizer(lr=2e-4, warmup=1)
        d_opt = tstep.make_optimizer(lr=2e-4, warmup=1)
        d_step, g_step = tstep.make_gan_steps(cfg, g_opt, d_opt)
        gs, ds = tstep.init_state(params, g_opt), tstep.init_state(disc_params, d_opt)
        ds, d_loss = d_step(ds, gs.params, mel, audio)
        gs, g_metrics = g_step(gs, ds.params, mel, audio, fmask)
        return float(d_loss), {k: float(v) for k, v in g_metrics.items()}, gs

    def run_sharded():
        g_opt = tstep.make_optimizer(lr=2e-4, warmup=1)
        d_opt = tstep.make_optimizer(lr=2e-4, warmup=1)
        mesh = make_mesh(n_data=4, n_model=2)
        gs, ds = tstep.init_state(params, g_opt), tstep.init_state(disc_params, d_opt)
        d_step, g_step, gs, ds = tstep.make_sharded_gan_steps(
            cfg, g_opt, d_opt, mesh, gs, ds
        )
        # Discriminator conv weights actually sharded over 'model'.
        w = ds.params["mpd"]["subs"][0]["convs"][1]["w"]
        assert not w.sharding.is_fully_replicated
        ds, d_loss = d_step(ds, gs.params, mel, audio)
        gs, g_metrics = g_step(gs, ds.params, mel, audio, fmask)
        return float(d_loss), {k: float(v) for k, v in g_metrics.items()}, gs

    d1, m1, gs1 = run_single()
    d2, m2, gs2 = run_sharded()
    assert d1 == pytest.approx(d2, rel=2e-3)
    for k in m1:
        assert m1[k] == pytest.approx(m2[k], rel=2e-3, abs=1e-4), k
    # Updated generator params agree leaf-by-leaf.
    for a, b in zip(
        jax.tree_util.tree_leaves(gs1.params), jax.tree_util.tree_leaves(gs2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4)


# ---------------------------------------------------------------- checkpoint


def test_checkpoint_roundtrip(cfg, params, tmp_path):
    path = save_params(str(tmp_path / "ckpt"), params, step=7)
    assert "step_00000007" in path
    restored = restore_params(path)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_ema_update(cfg, params):
    ema = tstep.ema_init(params)
    bumped = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    ema2 = tstep.ema_update(ema, bumped, decay=0.9)
    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(ema2)[0]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a) * 0.9 + (np.asarray(a) + 1.0) * 0.1, atol=1e-6)


# ---------------------------------------------------------------- multi-host helpers


def test_hybrid_mesh_single_host_degrades_to_flat():
    """All virtual CPU devices share one process => hybrid == flat ('data','model')."""
    from gonova_tts_tpu.parallel import make_hybrid_mesh, make_mesh

    m = make_hybrid_mesh(n_model=2)
    flat = make_mesh(n_model=2)
    assert m.axis_names == ("data", "model")
    assert m.devices.shape == flat.devices.shape


def test_hybrid_mesh_rejects_model_axis_crossing_hosts():
    """'model' must stay inside one host's ICI domain."""
    import pytest as _pytest

    from gonova_tts_tpu.parallel.mesh import make_hybrid_mesh

    class FakeDev:
        def __init__(self, pid):
            self.process_index = pid

    devs = [FakeDev(i // 2) for i in range(8)]  # 4 hosts x 2 devices
    with _pytest.raises(ValueError, match="ICI domain"):
        make_hybrid_mesh(n_model=4, devices=devs)


def test_init_distributed_noop_without_env(monkeypatch):
    from gonova_tts_tpu.parallel import init_distributed

    monkeypatch.delenv("TTS_COORDINATOR", raising=False)
    assert init_distributed() is False


@pytest.mark.slow
def test_multihost_two_process_train_step():
    """REAL multi-host integration: two OS processes (4 virtual CPU devices each)
    form one 8-device system via jax.distributed and run the full dp×tp sharded
    train step on a DCN×ICI hybrid mesh — cross-host 'data' collectives ride the
    Gloo transport. Ranks must agree on the loss (tools/multihost_smoke.py)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "multihost_smoke.py"), "--port", "29519"],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"] and report["ranks_agree"]
    assert report["hosts"] == 2 and report["global_devices"] == 8


@pytest.mark.slow
def test_train_loop_gan_phase_uses_mesh(tmp_path):
    """Loop-level wiring: with n_data>1 the adversarial phase must run the
    SHARDED gan steps (regression: the loop always built the unsharded pair,
    silently dropping requested parallelism for the GAN fine-tune)."""
    from unittest import mock

    from gonova_tts_tpu.config import Config, ModelConfig
    from gonova_tts_tpu.train import loop as tloop
    from gonova_tts_tpu.utils import write_wav

    sr = 24000
    audio = 0.3 * np.sin(2 * np.pi * 150 * np.arange(sr) / sr).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, audio, sr)
    mpath = str(tmp_path / "m.txt")
    with open(mpath, "w") as f:
        f.write(f"{path}|Hello sharded world.\n{path}|Another line here.\n")

    cfg = Config()
    cfg.model = ModelConfig(
        d_model=64, n_heads=2, d_ff=128, encoder_layers=1, decoder_layers=1,
        speaker_dim=32, upsample_initial_channel=32, vocos_dim=128, vocos_ff=256,
        vocos_layers=2, compute_dtype="float32", disc_width=0.25,
    )
    with mock.patch.object(
        tstep, "make_sharded_gan_steps", wraps=tstep.make_sharded_gan_steps
    ) as sharded_spy, mock.patch.object(
        tstep, "make_gan_steps", wraps=tstep.make_gan_steps
    ) as plain_spy:
        metrics = tloop.train(
            config=cfg, manifest=mpath, steps=2, batch_size=2, lr=1e-4,
            n_data=2, gan=True, gan_steps=2,
        )
    assert sharded_spy.call_count == 1
    assert plain_spy.call_count == 0
    for k in ("gan_d", "gan_adv"):
        if k in metrics:
            assert np.isfinite(metrics[k])
