#!/usr/bin/env python
"""PEFT demo (mirror of /root/reference/inference/python/peft_demo/):
finetune a LoRA adapter on a tiny dataset while co-serving, then compare
base-model vs adapter generations.

    FF_MODEL_DIR=... python -m inference.peft_demo.demo
"""

import json
import os
import tempfile


def main():
    from inference.peft import main as peft_main

    model = os.environ["FF_MODEL_DIR"]
    with tempfile.TemporaryDirectory() as d:
        dataset = os.path.join(d, "dataset.json")
        prompts = os.path.join(d, "prompts.json")
        json.dump(
            ["The quick brown fox jumps over the lazy dog."] * 4,
            open(dataset, "w"),
        )
        json.dump(["The quick brown"], open(prompts, "w"))
        return peft_main([
            "-llm-model", model, "-enable-peft",
            "-prompt", prompts, "-finetuning-dataset", dataset,
            "--max-new-tokens", "16", "--max-training-steps", "4",
            "--save-peft", os.path.join(d, "adapter"),
        ])


if __name__ == "__main__":
    raise SystemExit(main())
