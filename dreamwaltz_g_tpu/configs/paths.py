"""Path registry (reference: configs/paths.py).

All external assets are resolved relative to these roots; override via
environment variables of the same name.
"""
import os

HUMAN_TEMPLATES = os.environ.get("HUMAN_TEMPLATES", "./external/human_templates/")

AIST_ROOT = os.environ.get("AIST_ROOT", "./datasets/AIST++/")
MOTIONX_ROOT = os.environ.get("MOTIONX_ROOT", "./datasets/Motion-X/")
MOTIONX_REENACT_ROOT = os.environ.get("MOTIONX_REENACT_ROOT", "./datasets/Motion-X-ReEnact/")
PW3D_ROOT = os.environ.get("PW3D_ROOT", "./datasets/3DPW/")
TALKSHOW_ROOT = os.environ.get("TALKSHOW_ROOT", "./datasets/TalkShow/")
AMASS_ROOT = os.environ.get("AMASS_ROOT", "./datasets/AMASS/")
TRAM_ROOT = os.environ.get("TRAM_ROOT", "./datasets/tram/")

# demo motion bundles shipped with the repo (reference: data/human/demo.py)
DEMO_MOTIONS = os.environ.get("DEMO_MOTIONS", "./assets/motions/")

# converted JAX guidance weights (SD1.5 / ControlNet / VAE / CLIP)
GUIDANCE_WEIGHTS = os.environ.get("GUIDANCE_WEIGHTS", "./external/guidance_jax/")
