"""Distribution layer: hub tag resolution + option-args, AOT export
round-trip (reference hubconf.py:13-114, chain/model.py:167-174 final.jit)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _tiny_anon(tmp_path):
    import jax

    from satpu import infer_helper
    from satpu.models.anonymizer import AnonymizationNet, AnonymizerConfig
    from satpu.models.asrbn import TDNNFNetConfig

    asrbn = dict(output_dim=16, hidden_dim=16, bottleneck_dim=8,
                 prefinal_bottleneck_dim=8)
    cfg = AnonymizerConfig(asrbn=TDNNFNetConfig(**asrbn), num_speakers=3,
                           bn_dim=8, upsample_rates=(4, 4),
                           upsample_kernel_sizes=(8, 8),
                           upsample_initial_channel=32)
    model = AnonymizationNet(cfg)
    wav = np.zeros((1, 16000), np.float32)
    f0 = np.zeros((1, 50), np.float32)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), wav, f0, np.zeros((1,), np.int32),
        method=model.convert))()
    path = str(tmp_path / "anon.ckpt")
    infer_helper.save_model(path, "anonymizer_tdnnf_hifigan",
                            {"asrbn": asrbn, "num_speakers": 3, "bn_dim": 8,
                             "upsample_rates": [4, 4],
                             "upsample_kernel_sizes": [8, 8],
                             "upsample_initial_channel": 32},
                            variables, extra_meta={"speakers": ["a", "b", "c"]})
    return model, variables, path


def test_hub_tag_and_option_args(tmp_path, monkeypatch):
    from satpu import hub

    model, variables, path = _tiny_anon(tmp_path)
    # register a tag pointing at a file in the zoo dir
    monkeypatch.setenv("SATPU_ZOO", str(tmp_path))
    hub.MODEL_ZOO["tiny_test_model"] = ("", "anon.ckpt")
    try:
        m, v, meta = hub.load("tiny_test_model")
        assert meta["speakers"] == ["a", "b", "c"]
        # option-args override build params (the +f0-transformation mechanism)
        m2, _, _ = hub.load("tiny_test_model+f0-transformation=quant_16")
        assert m2.cfg.f0_transformation == "quant_16"
        with pytest.raises(KeyError):
            hub.load("not_a_tag")
    finally:
        hub.MODEL_ZOO.pop("tiny_test_model")


def test_aot_export_roundtrip(tmp_path):
    import jax

    from satpu import hub

    model, variables, _ = _tiny_anon(tmp_path)
    # the artifact is bound to the lowering platform: export for CPU here
    # (production exports run on the TPU host and record 'tpu')
    path = hub.export_convert(model, variables, str(tmp_path / "final.bin"),
                              batch=1, num_samples=16000, platforms=("cpu",))
    assert os.path.getsize(path) > 1000
    fn = hub.load_exported(path)
    wav = (np.random.default_rng(0).standard_normal((1, 16000)) * 0.1).astype(np.float32)
    tid = np.zeros((1,), np.int32)
    out = np.asarray(fn(wav, tid)[0] if isinstance(fn(wav, tid), (tuple, list))
                     else fn(wav, tid))
    # matches the eager path
    import jax

    f0 = model.get_f0(wav)
    ref = np.asarray(model.apply(variables, wav, f0, tid, method=model.convert))
    np.testing.assert_allclose(out.reshape(ref.shape), ref, atol=2e-5)


def test_import_model_cli_installs_zoo_tag(tmp_path, monkeypatch):
    """The flagship-artifact recipe: import_model converts a reference-format
    final.pt and installs it so hub.load(tag) works offline (VERDICT #8)."""
    import torch

    from satpu import hub
    from satpu.bin import import_model
    from test_assembled_golden import _make_reference_final_pt

    pt_path, _, _ = _make_reference_final_pt(tmp_path, num_speakers=4)
    monkeypatch.setenv("SATPU_ZOO", str(tmp_path / "zoo"))
    rc = import_model.main(["--torch-checkpoint", pt_path,
                            "--tag", "hifigan_bn_tdnnf_wav2vec2_vq_48_v1"])
    assert rc == 0
    model, variables, meta = hub.load(
        "hifigan_bn_tdnnf_wav2vec2_vq_48_v1+f0-transformation=quant_16")
    assert model.cfg.f0_transformation == "quant_16"
    assert meta["build_params"]["num_speakers"] == 4
