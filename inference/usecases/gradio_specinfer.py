#!/usr/bin/env python
"""Gradio UI over SPECULATIVE decoding (mirror of
/root/reference/inference/python/usecases/gradio_specinfer.py). Requires gradio.

    FF_MODEL_DIR=... FF_SSM_DIRS=... python -m inference.usecases.gradio_specinfer
"""

import os


def main():
    import gradio as gr

    from flexflow_tpu.serve import LLM, SSM

    llm = LLM(os.environ["FF_MODEL_DIR"])
    ssms = [SSM(d) for d in os.environ["FF_SSM_DIRS"].split(",") if d.strip()]
    llm.compile(
        max_requests_per_batch=int(os.environ.get("FF_MAX_BATCH", 4)),
        max_seq_length=int(os.environ.get("FF_MAX_SEQ", 512)),
        ssms=ssms,
    )
    llm.start_server()

    def generate(prompt, max_new_tokens):
        [res] = llm.generate(prompt, max_new_tokens=int(max_new_tokens))
        return res.output_text

    iface = gr.Interface(
        fn=generate,
        inputs=[gr.Textbox(label="Prompt"),
                gr.Slider(1, 512, value=128, label="Max new tokens")],
        outputs=gr.Textbox(label="Output"),
        title="flexflow_tpu speculative decoding (lossless)",
    )
    iface.launch()


if __name__ == "__main__":
    main()
