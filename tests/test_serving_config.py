"""The benchmark must measure the shipped serving configuration.

Round-4 regression class: bench.py flipped a serving flag the real CLI
never set, so the headline measured a config no user could reach. This
test pins bench.flagship_config() to the AnonymizerConfig that
bin/anonymize builds (infer_helper.load_model + serving_option_args) from
a flagship checkpoint.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bench_config_equals_pipeline_config(tmp_path, monkeypatch):
    monkeypatch.delenv("BENCH_DTYPE", raising=False)
    import bench
    from satpu import infer_helper

    want = bench.flagship_config()

    # a flagship checkpoint as the converter would write it
    ckpt = str(tmp_path / "final.satpu")
    infer_helper.save_model(
        ckpt, "anonymizer_tdnnf_hifigan",
        {"asrbn": {"output_dim": 3280, "bottleneck": "vq", "codebook_size": 48},
         "num_speakers": 247},
        variables={"params": {}})

    # exactly what bin/anonymize.py does (default --compute-dtype)
    model, _, _ = infer_helper.load_model(
        ckpt, option_args=infer_helper.serving_option_args("bfloat16"))
    assert model.cfg == want
