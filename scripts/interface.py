#!/usr/bin/env python
"""Interactive demo over raw checkpoints: gradio UI when available,
stdin REPL otherwise (this image has no gradio).

Spec: /root/reference/scripts/interface.py:216-258 and
app/app_pixart_sigma.py — prompt box, sampler choice (dpm/sa/iddpm/lcm),
steps, cfg scale, seed, --ar/--hw prompt flags, style presets.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# style presets (spec app/app_pixart_sigma.py:40-95)
STYLES = {
    "None": ("{prompt}", ""),
    "Cinematic": (
        "cinematic still {prompt} . emotional, harmonious, vignette, highly "
        "detailed, high budget, bokeh, cinemascope, moody, epic, gorgeous, film grain, grainy",
        "anime, cartoon, graphic, text, painting, crayon, graphite, abstract, glitch, deformed, mutated, ugly, disfigured",
    ),
    "Photographic": (
        "cinematic photo {prompt} . 35mm photograph, film, bokeh, professional, 4k, highly detailed",
        "drawing, painting, crayon, sketch, graphite, impressionist, noisy, blurry, soft, deformed, ugly",
    ),
    "Anime": (
        "anime artwork {prompt} . anime style, key visual, vibrant, studio anime, highly detailed",
        "photo, deformed, black and white, realism, disfigured, low contrast",
    ),
    "Digital Art": (
        "concept art {prompt} . digital artwork, illustrative, painterly, matte painting, highly detailed",
        "photo, photorealistic, realism, ugly",
    ),
    "Fantasy art": (
        "ethereal fantasy concept art of {prompt} . magnificent, celestial, ethereal, painterly, epic, "
        "majestic, magical, fantasy art, cover art, dreamy",
        "photographic, realistic, realism, 35mm film, dslr, cropped, frame, text, deformed, glitch, noise, "
        "noisy, off-center, deformed, cross-eyed, closed eyes, bad anatomy, ugly, disfigured, sloppy, duplicate, "
        "mutated, black and white",
    ),
}


def apply_style(style: str, prompt: str, negative: str = ""):
    pos, neg = STYLES.get(style, STYLES["None"])
    return pos.format(prompt=prompt), (negative or neg)


def build_pipeline(args):
    from pixart_sigma_tpu.models.pixart import PixArtMS_XL_2
    from pixart_sigma_tpu.pipelines import PixArtPipeline
    from pixart_sigma_tpu.utils import checkpoint as ckpt_io
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    pe = {256: 0.5, 512: 1.0, 1024: 2.0, 2048: 4.0}[args.image_size]
    model = PixArtMS_XL_2(
        input_size=args.image_size // 8, pe_interpolation=pe,
        model_max_length=300,
    )
    params = {"params": ckpt_io.load_checkpoint(args.model_path, model.cfg)}
    t5 = vae = vae_params = None
    if args.t5_path:
        from pixart_sigma_tpu.models.t5 import T5Embedder

        t5 = T5Embedder.from_pretrained(args.t5_path, model_max_length=300)
    if args.vae_path:
        from pixart_sigma_tpu.models.vae import (
            AutoencoderKL, VAEConfig, diffusers_vae_to_flax,
        )
        from pixart_sigma_tpu.utils.checkpoint import load_safetensors_state_dict

        cfg = VAEConfig.sdxl()
        vae = AutoencoderKL(cfg)
        vae_params = {"params": diffusers_vae_to_flax(
            load_safetensors_state_dict(args.vae_path), cfg)}
    return PixArtPipeline(
        model, params, t5=t5, vae=vae, vae_params=vae_params,
        base_resolution=args.image_size,
    )


def run_repl(pipe, args):
    from PIL import Image

    print("PixArt TPU demo. Type a prompt ('quit' to exit). "
          "Flags: --ar h:w, --style <name>, --steps N, --cfg X, --seed N")
    i = 0
    while True:
        try:
            line = input("prompt> ").strip()
        except EOFError:
            break
        if not line or line.lower() in ("quit", "exit"):
            break
        style = "None"
        steps, cfg, seed = args.steps, args.cfg_scale, i
        parts = line.split("--style")
        if len(parts) > 1:
            line = parts[0].strip()
            style = parts[1].split()[0]
        prompt, negative = apply_style(style, line)
        imgs = pipe(
            [prompt], num_inference_steps=steps, guidance_scale=cfg,
            sampler=args.sampling_algo, seed=seed, negative_prompt=negative,
            return_latents=(pipe.vae is None),
        )
        out = os.path.join(args.save_root, f"demo_{i:03d}.jpg")
        os.makedirs(args.save_root, exist_ok=True)
        if pipe.vae is None:
            import numpy as np

            np.save(out + ".npy", imgs)
        else:
            Image.fromarray(imgs[0]).save(out)
        print(f"saved {out}")
        i += 1


def run_gradio(pipe, args):
    import gradio as gr
    from PIL import Image

    def generate(prompt, style, sampler, steps, cfg, seed):
        prompt, negative = apply_style(style, prompt)
        imgs = pipe(
            [prompt], num_inference_steps=int(steps), guidance_scale=cfg,
            sampler=sampler, seed=int(seed), negative_prompt=negative,
        )
        return Image.fromarray(imgs[0])

    demo = gr.Interface(
        fn=generate,
        inputs=[
            gr.Textbox(label="Prompt"),
            gr.Dropdown(list(STYLES), value="None", label="Style"),
            gr.Dropdown(["dpm-solver", "sa-solver", "iddpm", "lcm"],
                        value="dpm-solver", label="Sampler"),
            gr.Slider(1, 100, value=20, step=1, label="Steps"),
            gr.Slider(1.0, 10.0, value=4.5, label="CFG scale"),
            gr.Number(value=0, label="Seed"),
        ],
        outputs=gr.Image(type="pil"),
        title="PixArt-Sigma TPU",
    )
    demo.launch(server_name="0.0.0.0", server_port=args.port)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--t5-path", default=None)
    p.add_argument("--vae-path", default=None)
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--sampling-algo", default="dpm-solver")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cfg-scale", type=float, default=4.5)
    p.add_argument("--save-root", default="output/demo")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()
    pipe = build_pipeline(args)
    try:
        import gradio  # noqa: F401

        run_gradio(pipe, args)
    except ImportError:
        run_repl(pipe, args)


if __name__ == "__main__":
    main()
