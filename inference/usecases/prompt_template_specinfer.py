#!/usr/bin/env python
"""Prompt-template usecase over SPECULATIVE decoding.

Mirror of /root/reference/inference/python/usecases/prompt_template_specinfer.py:
the same LLMChain recipe served by the lossless tree-speculative stack
(LLM + SSM drafts through the background SpecRequestManager).

    FF_MODEL_DIR=... FF_SSM_DIRS=... python -m inference.usecases.prompt_template_specinfer
"""

import os

from inference.usecases.langchain_support import (
    FlexFlowLLMWrapper, make_chain, make_langchain_llm, make_prompt_template,
)


def build_chain(llm=None, max_new_tokens=64):
    if llm is None:
        from flexflow_tpu.serve import LLM, SSM

        llm = LLM(os.environ["FF_MODEL_DIR"])
        ssms = [SSM(d) for d in os.environ["FF_SSM_DIRS"].split(",") if d.strip()]
        llm.compile(
            max_requests_per_batch=int(os.environ.get("FF_MAX_BATCH", 4)),
            max_seq_length=int(os.environ.get("FF_MAX_SEQ", 256)),
            ssms=ssms,
        )
    llm.start_server()
    wrapper = make_langchain_llm(
        FlexFlowLLMWrapper(llm, max_new_tokens=max_new_tokens)
    )
    prompt = make_prompt_template("Question: {question}\nAnswer:", ["question"])
    return make_chain(wrapper, prompt), llm


def main():
    chain, llm = build_chain()
    print(chain.run(question=os.environ.get("FF_QUESTION", "What is a TPU?")))
    llm.stop_server()


if __name__ == "__main__":
    main()
