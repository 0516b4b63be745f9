"""End-to-end smoke: train -> checkpoint -> resume -> export .pth ->
reload via from_pretrain -> eval metrics -> CSS stitching."""
import json
import os

import numpy as np
import pytest

import jax

from test_data_metrics_utils import make_synth_split

SR = 8000


@pytest.fixture(scope="module")
def debug_config(tmp_path_factory):
    root = tmp_path_factory.mktemp("debug_data")
    for split in ("tr", "dev", "tt"):
        make_synth_split(str(root / split), n_utt=4, seconds=(1.2, 1.5),
                         seed=1)
    exp_root = tmp_path_factory.mktemp("exp")
    from tdanet_tpu.utils import load_yaml
    conf = load_yaml(os.path.join(os.path.dirname(__file__), "..",
                                  "configs", "tdanet_debug.yml"))
    dc = conf["datamodule"]["data_config"]
    dc.update(train_dir=str(root / "tr"), valid_dir=str(root / "dev"),
              test_dir=str(root / "tt"))
    conf["main_args"] = {"exp_dir": str(exp_root / "ckpt")}
    # shrink further for CI speed
    conf["audionet"]["audionet_config"].update(num_blocks=1,
                                               upsampling_depth=4)
    return conf


def test_train_checkpoints_and_exports(debug_config):
    from tdanet_tpu.system.training_loop import AudioTrainer
    from tdanet_tpu.parallel import make_mesh

    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    trainer = AudioTrainer(debug_config, mesh=mesh)
    # training must rematerialize the shared-weight recurrence (the
    # full recipe OOMs a 16 GB chip otherwise; docs/PERF.md)
    assert trainer.model.sm.remat
    history = trainer.fit()
    assert len(history) == 2
    assert np.isfinite(history[-1]["val_loss"])
    exp_dir = debug_config["main_args"]["exp_dir"]
    assert os.path.exists(os.path.join(exp_dir, "best_model.pth"))
    assert os.path.exists(os.path.join(exp_dir, "history.json"))
    with open(os.path.join(exp_dir, "best_k_models.json")) as f:
        best = json.load(f)
    assert best["kept_steps"]


def test_train_single_target_n_src1(debug_config, tmp_path):
    """End-to-end n_src=1 single-target mode: the dataset expands each
    utterance into one (mix, source) pair per source (target (1, T),
    libri2mixdatamodule.py:68-95) and the model trains with
    num_sources=1."""
    from tdanet_tpu.system.training_loop import AudioTrainer
    from tdanet_tpu.parallel import make_mesh

    conf = json.loads(json.dumps(debug_config))  # deep copy
    conf["datamodule"]["data_config"]["n_src"] = 1
    conf["audionet"]["audionet_config"]["num_sources"] = 1
    conf["training"] = dict(conf["training"], epochs=1)
    conf["main_args"] = {"exp_dir": str(tmp_path / "nsrc1")}
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    trainer = AudioTrainer(conf, mesh=mesh)
    history = trainer.fit()
    assert np.isfinite(history[-1]["train_loss"])
    # 4 utts * 2 sources, batch_size from debug config
    assert len(trainer.datamodule.data_train) == 8
    mix, src, _ = trainer.datamodule.data_train[0]
    assert src.ndim == 2 and src.shape[0] == 1


def test_train_from_reference_yaml(tmp_path):
    """Config compatibility: the reference's VERBATIM tdanet_debug.yml
    (TDANetMultRes + feat_len/kernels keys, gpus/parallel/log_freq/
    pin_memory/persistent_workers extras, ReduceLROnPlateau, lr 2e-3)
    trains through AudioTrainer with only data-dir/size overrides —
    a reference user's YAML works unchanged."""
    from tdanet_tpu.system.training_loop import AudioTrainer
    from tdanet_tpu.parallel import make_mesh
    from tdanet_tpu.utils import load_yaml

    conf = load_yaml("/root/reference/configs/tdanet_debug.yml")
    root = tmp_path / "data"
    for split in ("tr", "dev", "tt"):
        make_synth_split(str(root / split), n_utt=4, seconds=(1.2, 1.5),
                         seed=1)
    dc = conf["datamodule"]["data_config"]
    dc.update(train_dir=str(root / "tr"), valid_dir=str(root / "dev"),
              test_dir=str(root / "tt"), batch_size=2, segment=1.2,
              num_workers=1)
    conf["audionet"]["audionet_config"].update(num_blocks=1)
    conf["training"] = dict(conf["training"], epochs=1)
    conf["main_args"] = {"exp_dir": str(tmp_path / "refcfg")}
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    trainer = AudioTrainer(conf, mesh=mesh)
    assert type(trainer.model).__name__ == "TDANetMultRes"
    history = trainer.fit()
    assert np.isfinite(history[-1]["train_loss"])
    # reference lr honored (2e-3, configs/tdanet_debug.yml optimizer)
    assert abs(history[-1]["lr"] - 2e-3) < 1e-6


def test_resume_continues(debug_config):
    from tdanet_tpu.system.training_loop import AudioTrainer
    from tdanet_tpu.parallel import make_mesh

    conf = dict(debug_config)
    conf["training"] = dict(debug_config["training"], epochs=3)
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    trainer = AudioTrainer(conf, mesh=mesh)
    history = trainer.fit(resume=True)
    assert history  # at least the resumed epoch ran
    assert history[0]["epoch"] == 2


def test_from_pretrain_roundtrip(debug_config):
    from tdanet_tpu.models import BaseModel

    exp_dir = debug_config["main_args"]["exp_dir"]
    pth = os.path.join(exp_dir, "best_model.pth")
    model, params = BaseModel.from_pretrain(pth)
    assert type(model).__name__ == "TDANetBest"
    est = model.apply(params, np.zeros((1, 4000), np.float32))
    assert est.shape == (1, 2, 4000)


def test_eval_metrics_on_trained(debug_config, tmp_path):
    from tdanet_tpu.models import BaseModel
    from tdanet_tpu.metrics import MetricsTracker
    from tdanet_tpu.datas import Libri2MixDataModule
    from tdanet_tpu.utils import separate

    exp_dir = debug_config["main_args"]["exp_dir"]
    model, params = BaseModel.from_pretrain(
        os.path.join(exp_dir, "best_model.pth"))
    dm = Libri2MixDataModule(
        **{**debug_config["datamodule"]["data_config"], "segment": None})
    dm.setup()
    _, _, test_set = dm.make_sets
    tracker = MetricsTracker(str(tmp_path / "metrics.csv"))
    for i in range(2):
        mix, src, key = test_set[i]
        est = separate(model, params, mix)
        tracker(mix, src, np.asarray(est), key)
    res = tracker.final()
    assert np.isfinite(res["si-snr_i"])


def test_eval_cli_through_bundle(debug_config, tmp_path, monkeypatch):
    """audio_test.py --bundle: the AOT artifact (no model code, no
    checkpoint load) reproduces the model-code eval metrics."""
    import yaml

    import audio_test
    from tdanet_tpu import deploy
    from tdanet_tpu.models import BaseModel

    src_exp = debug_config["main_args"]["exp_dir"]
    ckpt = os.path.join(src_exp, "best_model.pth")
    model, params = BaseModel.from_pretrain(ckpt)
    dc = debug_config["datamodule"]["data_config"]
    with open(os.path.join(dc["test_dir"], "mix_clean.json")) as f:
        rows = json.load(f)
    sr = model.sample_rate()
    bundle = tmp_path / "bundle"
    deploy.save_bundle(str(bundle), model, params,
                       lengths=[n / sr for _p, n in rows], batch_size=2)

    # the CLI resolves Experiments/checkpoint/<exp_name> under cwd
    conf = json.loads(json.dumps(debug_config))
    conf["exp"] = {"exp_name": "bundle_eval"}
    cli_exp = tmp_path / "Experiments" / "checkpoint" / "bundle_eval"
    os.makedirs(cli_exp)
    with open(cli_exp / "conf.yml", "w") as f:
        yaml.safe_dump(conf, f)
    monkeypatch.chdir(tmp_path)

    got = audio_test.main(["--conf_dir", str(cli_exp / "conf.yml"),
                           "--bundle", str(bundle)])
    want = audio_test.main(["--conf_dir", str(cli_exp / "conf.yml"),
                            "--ckpt_path", ckpt, "--batch_size", "2"])
    for k in ("si-snr_i", "sdr_i"):
        assert np.isfinite(got[k])
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-4)

    # depth/dp knobs are baked at export time, not eval time
    with pytest.raises(SystemExit):
        audio_test.main(["--conf_dir", str(cli_exp / "conf.yml"),
                         "--bundle", str(bundle), "--num_blocks", "1"])


def test_css_stitching(debug_config, tmp_path):
    from tdanet_tpu.models import BaseModel
    from tdanet_tpu.datas import LibriCSSDataset
    from tdanet_tpu.utils import write_wav
    from tdanet_tpu.utils.css import stitch_segments

    exp_dir = debug_config["main_args"]["exp_dir"]
    model, params = BaseModel.from_pretrain(
        os.path.join(exp_dir, "best_model.pth"))
    # make a long-form wav
    rng = np.random.default_rng(3)
    T = int(SR * 3.3)
    write_wav(str(tmp_path / "long.wav"),
              rng.standard_normal(T).astype(np.float32) * 0.1, SR)
    ds = LibriCSSDataset(str(tmp_path), sample_rate=SR, segment=1.0,
                         overlap=0.25)
    name, segments, pad_len = ds[0]
    overlap_len = int(SR * 1.0 * 0.25)
    streams = stitch_segments(model, params, segments, overlap_len)
    if pad_len:
        streams = streams[:, :-pad_len]
    assert streams.shape == (2, T)


def test_css_sp_mode_cli(debug_config, tmp_path):
    """audio_test_css.py --mode sp: one sequence-parallel forward over
    the 8-device CPU mesh instead of chunk+stitch; output wavs have the
    input length."""
    import yaml

    import audio_test_css
    from tdanet_tpu.utils import read_wav, write_wav

    exp_dir = debug_config["main_args"]["exp_dir"]
    # the CLI reads the frozen conf (audio_train.py writes it; the
    # in-process AudioTrainer fixture does not) — freeze it here
    conf_path = os.path.join(exp_dir, "conf.yml")
    if not os.path.exists(conf_path):
        os.makedirs(exp_dir, exist_ok=True)  # standalone-run safe
        with open(conf_path, "w") as f:
            yaml.safe_dump(json.loads(json.dumps(debug_config)), f)
    rng = np.random.default_rng(4)
    T = int(SR * 2.7)
    long_dir = tmp_path / "long"
    long_dir.mkdir()
    write_wav(str(long_dir / "a.wav"),
              rng.standard_normal(T).astype(np.float32) * 0.1, SR)
    out_dir = tmp_path / "css_sp"
    rc = audio_test_css.main([
        "--conf_dir", conf_path,
        "--ckpt_path", os.path.join(exp_dir, "best_model.pth"),
        "--test_dir", str(long_dir), "--mode", "sp",
        "--save_path", str(out_dir)])
    assert rc in (None, 0)
    for s in (1, 2):
        wav, sr = read_wav(str(out_dir / f"s{s}" / "a.wav"))
        assert sr == SR and wav.shape[-1] == T
