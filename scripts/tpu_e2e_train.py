"""End-to-end learning validation on the real chip: overfit a small
synthetic MPII set through the full stack (tf.data uint8 pipeline ->
pjit'd train step -> Orbax -> eval) and require train-set accuracy to
approach 1.0.  Run manually: python -u scripts/tpu_e2e_train.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from attentionalpoolingaction_tpu import evaluate as eval_lib
from attentionalpoolingaction_tpu import train as train_lib
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.data import records
from attentionalpoolingaction_tpu.data.datasets import get_dataset


def main():
    d = tempfile.mkdtemp()
    spec = get_dataset("mpii")
    # 64 images over 8 distinct classes with strong class-colored signal
    # (pure iid noise is near-unlearnable through a random-init deep net)
    records.write_synthetic_dataset(d + "/t.tfrecord", spec, 64,
                                    image_size=256, seed=0,
                                    class_signal=0.8,
                                    num_distinct_classes=8)
    cfg = TrainConfig(
        dataset="mpii", pooling="attention", backbone="resnet_v1_101",
        image_size=224, batch_size=32, learning_rate=1e-3,
        grad_clip_norm=10.0, lr_schedule="cosine", num_steps=400,
        log_every=25,
        train_pattern=d + "/t.tfrecord", eval_pattern=d + "/t.tfrecord",
        eval_batch_size=32, resize_min=256, resize_max=257,
        bn_momentum=0.9)  # running stats converge within the short run

    state, hist = train_lib.train(cfg, num_steps=400)
    losses = [h["loss/total"] for h in hist]
    print("losses:", [round(x, 3) for x in losses], flush=True)

    results = eval_lib.evaluate(cfg, state)
    print("train-set eval:", results, flush=True)
    assert np.isfinite(losses).all()
    tail = float(np.mean(losses[-3:]))
    assert tail < losses[0] * 0.6, "did not learn"
    assert results["accuracy"] > 0.5, "did not overfit the train set"

    # int8 PTQ delta on TRAINED weights (the random-init logit cosine in
    # tests underestimates nothing here: same protocol, same data, only
    # the backbone path is quantized)
    import dataclasses
    results8 = eval_lib.evaluate(
        dataclasses.replace(cfg, eval_int8=True), state)
    print("train-set eval (int8):", results8, flush=True)
    drop = results["accuracy"] - results8["accuracy"]
    print(f"int8 accuracy delta: {drop:+.4f} "
          f"({results['accuracy']:.3f} -> {results8['accuracy']:.3f})",
          flush=True)
    assert results8["accuracy"] > results["accuracy"] - 0.05, \
        "int8 quantization lost >5 points on the overfit set"
    print("E2E LEARNING OK", flush=True)


if __name__ == "__main__":
    main()
