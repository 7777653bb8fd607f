#!/usr/bin/env python
"""PEFT CLI: co-served inference + LoRA finetuning.

Flag-compatible mirror of the reference PEFT driver
(/root/reference/inference/peft/peft.cc): serve prompts through a registered
LoRA adapter while a finetuning session on ``-finetuning-dataset`` advances
one optimizer step per scheduler iteration in the same continuous batch
(reference: the finetuning slot appended to the batch,
``rm->set_enable_peft_finetuning``; peft.cc:277-285,366-370).
"""

import argparse
import json
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="PEFT co-serving + finetuning")
    p.add_argument("-llm-model", "--llm-model", dest="model", required=True)
    p.add_argument("-enable-peft", "--enable-peft", dest="enable_peft",
                   action="store_true")
    p.add_argument("-peft-model", "--peft-model", dest="peft_model",
                   default="", help="HF PEFT adapter directory")
    p.add_argument("-prompt", "--prompt", dest="prompt", default="")
    p.add_argument("-finetuning-dataset", "--finetuning-dataset",
                   dest="dataset", default="",
                   help="json file with a list of training strings")
    p.add_argument("-output-file", "--output-file", dest="output_file",
                   default="")
    p.add_argument("--max-requests-per-batch", type=int, default=8)
    p.add_argument("--max-tokens-per-batch", type=int, default=128)
    p.add_argument("--max-sequence-length", type=int, default=256)
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--max-training-steps", type=int, default=2)
    p.add_argument("--learning-rate", type=float, default=1e-3,
                   help="finetuning SGD lr (reference peft.cc:260)")
    p.add_argument("--lora-rank", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--topp", "--top-p", dest="topp", type=float, default=1.0)
    p.add_argument("--do-sample", action="store_true")
    p.add_argument("-tensor-parallelism-degree", "--tensor-parallelism-degree",
                   dest="tp", type=int, default=1)
    p.add_argument("-data-parallelism-degree", "--data-parallelism-degree",
                   dest="dp", type=int, default=1)
    p.add_argument("--full-precision", action="store_true")
    p.add_argument("--save-peft", dest="save_peft", default="",
                   help="export the finetuned adapter to this dir")
    p.add_argument("--profiling", action="store_true")
    p.add_argument("--verbose", action="store_true")
    return p


def main(argv=None):
    args, _legion_flags = build_parser().parse_known_args(argv)
    if not args.enable_peft and args.peft_model:
        print("PEFT model id passed, but PEFT is not enabled", file=sys.stderr)
        return 1

    from flexflow_tpu.config import config, ensure_cpu_devices
    from flexflow_tpu.peft.finetune import FinetuneSession
    from flexflow_tpu.peft.lora import LoraConfig, export_hf_adapter
    from flexflow_tpu.serve import LLM

    if args.profiling:
        config.profiling = True
    ensure_cpu_devices(args.tp * args.dp)

    llm = LLM(
        args.model,
        data_type="float32" if args.full_precision else "bfloat16",
        output_file=args.output_file,
    )
    serve_adapter = -1
    finetune_adapter = -1
    if args.enable_peft:
        base_cfg = LoraConfig(
            rank=args.lora_rank, alpha=args.lora_alpha,
            target_modules=("wq", "wv"),
            learning_rate=args.learning_rate, optimizer="sgd",
        )
        # serving adapter (from an HF PEFT dir when given) + a separate
        # trainable adapter slot (reference registers both, peft.cc:331-335)
        serve_adapter = llm.register_peft_adapter(
            args.peft_model if args.peft_model else base_cfg
        )
        finetune_adapter = llm.register_peft_adapter(
            llm._peft[0][0] if args.peft_model else base_cfg
        )
    llm.compile(
        max_requests_per_batch=args.max_requests_per_batch,
        max_seq_length=args.max_sequence_length,
        max_tokens_per_batch=args.max_tokens_per_batch,
        tensor_parallelism_degree=args.tp,
        data_parallelism_degree=args.dp,
    )

    session = None
    if args.enable_peft and args.dataset:
        with open(args.dataset) as f:
            texts = json.load(f)
        pairs = []
        for t in texts:
            ids = llm.tokenizer(t, return_tensors=None)["input_ids"]
            ids = ids[: args.max_sequence_length]
            if len(ids) < 2:
                continue
            toks = np.asarray([ids[:-1]], np.int32)
            labels = np.asarray([ids[1:]], np.int32)
            pairs.append((toks, labels))
        # honor --max-training-steps exactly: cap total optimizer steps
        # (epochs alone floors to one full epoch when steps < len(pairs))
        session = FinetuneSession(
            llm.spec, llm.lora_config, finetune_adapter, pairs,
            epochs=max(1, -(-args.max_training_steps // max(len(pairs), 1))),
            max_steps=args.max_training_steps,
        )
        llm.rm.register_finetune(session)

    prompts = ["Three tips for staying healthy are: "]
    if args.prompt:
        with open(args.prompt) as f:
            prompts = json.load(f)

    results = llm.generate(
        prompts, max_new_tokens=args.max_new_tokens,
        temperature=args.temperature if args.do_sample else 0.0,
        top_p=args.topp, adapter_id=serve_adapter,
    )
    for r in results:
        print(f"=== guid {r.guid} (steps {r.decoding_steps}, "
              f"latency {r.latency_ms:.1f}ms) ===")
        print(r.prompt + r.output_text)
    if session is not None:
        # drain any remaining finetuning steps (reference finishes the
        # finetuning request after serving drains)
        while not session.tick(llm.rm.engine):
            pass
        print(f"[Finetune] steps {len(session.losses)} "
              f"losses {['%.4f' % l for l in session.losses]}")
        if args.save_peft:
            export_hf_adapter(
                args.save_peft, llm.spec, llm.rm.engine.lora,
                finetune_adapter, llm.lora_config,
            )
            print(f"[Finetune] adapter saved to {args.save_peft}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
