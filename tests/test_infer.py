"""Inference API test: trained task-4 model served through Predictor."""

import numpy as np

from ggnn_tpu.data.babi import TASKS, examples_to_graphs, parse_graph_text
from ggnn_tpu.data.generators import generate_task_file
from ggnn_tpu.infer import Predictor
from ggnn_tpu.train import Trainer, build_config
from ggnn_tpu.train.metrics import MetricsLogger


def test_predictor_round_trip(tmp_path):
    cfg = build_config("babi4", epochs=60, data_root=str(tmp_path))
    t = Trainer(cfg, MetricsLogger(echo=False))
    result = t.run()
    assert result["test_accuracy"] >= 0.9

    ckpt = str(tmp_path / "model.npz")
    t.save(ckpt)

    pred = Predictor(cfg.model, t.spec, checkpoint_path=ckpt)
    spec = TASKS[4]
    text = generate_task_file(4, 20, seed=999)
    examples = [e for e in parse_graph_text(text, spec)
                if e.question_type == 0][:8]
    graphs = examples_to_graphs(examples, spec)
    preds = pred.predict(graphs)
    assert len(preds) == len(graphs)
    acc = np.mean([p == int(e.target) for p, e in zip(preds, examples)])
    assert acc >= 0.7  # trained on qtype 0; fresh generator draw
