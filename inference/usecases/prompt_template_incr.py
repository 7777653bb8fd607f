#!/usr/bin/env python
"""Prompt-template usecase over incremental decoding.

Mirror of /root/reference/inference/python/usecases/prompt_template_incr.py:
compile + background-serve an LLM, wrap it for LangChain, and answer a
templated question through an LLMChain. Runs with real LangChain when
installed, else with the stdlib fallbacks (usecases/langchain_support.py).

    FF_MODEL_DIR=/path/to/model python -m inference.usecases.prompt_template_incr
"""

import os

from inference.usecases.langchain_support import (
    FlexFlowLLMWrapper, make_chain, make_langchain_llm, make_prompt_template,
)


def build_chain(llm=None, max_new_tokens=64):
    if llm is None:
        from flexflow_tpu.serve import LLM

        llm = LLM(os.environ["FF_MODEL_DIR"])
        llm.compile(
            max_requests_per_batch=int(os.environ.get("FF_MAX_BATCH", 4)),
            max_seq_length=int(os.environ.get("FF_MAX_SEQ", 256)),
        )
    llm.start_server()
    wrapper = make_langchain_llm(
        FlexFlowLLMWrapper(llm, max_new_tokens=max_new_tokens)
    )
    template = "Question: {question}\nAnswer:"
    prompt = make_prompt_template(template, ["question"])
    return make_chain(wrapper, prompt), llm


def main():
    chain, llm = build_chain()
    question = os.environ.get(
        "FF_QUESTION", "Who was the US president in the year of the first moon landing?"
    )
    print(chain.run(question=question))
    llm.stop_server()


if __name__ == "__main__":
    main()
