"""Stage 1 inference: generate a caption/report from an X-ray image, visual embeds only.

CLI mirror of Stage1/inference_stage1.py:31-205 (single image -> caption via
vision tower -> projector -> decoder generate, no text prompt).
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from projectiontrainer_tpu.data import image as I
from projectiontrainer_tpu.generate import GenerationConfig, generate
from projectiontrainer_tpu.models import vlm
from projectiontrainer_tpu.train import setup
from projectiontrainer_tpu.utils.logging import setup_logging


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_path", type=str, required=True)
    p.add_argument("--vision_model_name", type=str, required=True)
    p.add_argument("--llm_name", type=str, required=True)
    p.add_argument("--projection_path", type=str, required=True,
                   help="Directory with projector weights + projector_config.json")
    p.add_argument("--img_size", type=int, default=384)
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--do_sample", action="store_true")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--top_k", type=int, default=None)
    # reference launcher passes this (Stage1/run_inference_stage1.sh,
    # inference_stage1.py:23 default 1.0)
    p.add_argument("--repetition_penalty", type=float, default=1.0)
    return p


def caption_image(image_path, vlm_cfg, params, tokenizer, *, img_size, gen_cfg):
    pixels = I.preprocess(I.load_image(image_path), img_size)[None]
    # jitted prefix build — the eager tower forward costs seconds/call in per-op
    # dispatch on the tunneled runtime
    visual, mask = vlm.visual_prefix(params, vlm_cfg, jnp.asarray(pixels))
    ids = generate(params["llm"], vlm_cfg.llm, visual, mask, gen_cfg)
    pad = tokenizer.pad_token_id or 0
    return tokenizer.decode(
        [t for t in np.asarray(ids)[0] if t != pad], skip_special_tokens=True
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    logger = setup_logging()
    vlm_cfg, params, _ = setup.build_vlm(
        args.vision_model_name, args.llm_name,
        stage1_projector_path=args.projection_path,
    )
    tokenizer = setup.load_tokenizer(args.llm_name)
    gen_cfg = GenerationConfig(
        max_new_tokens=args.max_new_tokens, num_beams=args.num_beams,
        do_sample=args.do_sample, temperature=args.temperature, top_p=args.top_p,
        top_k=args.top_k, repetition_penalty=args.repetition_penalty,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id or 0,
    )
    text = caption_image(
        args.image_path, vlm_cfg, params, tokenizer,
        img_size=args.img_size, gen_cfg=gen_cfg,
    )
    logger.info("generated caption: %s", text)
    print(text)
    return text


if __name__ == "__main__":
    main()
