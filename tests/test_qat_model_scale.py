"""CI smoke of the model-scale W4A8 QAT demo (tools/qat_mnv2_w4a8.py).

The full demo (full-depth MobileNetV2, 96px, oscillation dampening +
freezing) runs on the attached accelerator; this exercises the identical
pipeline — fp32 pretrain -> fc4_dw8 W4A8 PTQ -> QAT with damp/freeze —
at CI shapes and asserts the machinery holds accuracy and actually
freezes oscillating weights.
"""

import sys


def test_qat_mnv2_w4a8_smoke(monkeypatch):
    from tools.qat_mnv2_w4a8 import main

    monkeypatch.setattr(sys, "argv", ["qat_mnv2_w4a8", "--smoke"])
    result = main()
    assert result["qat_top1"] >= result["ptq_top1"] - 0.05
    # the QAT phase must actually run full-depth-style blocks + both
    # optimizers; trajectory recorded per epoch
    assert len(result["trajectory"]) == 4
