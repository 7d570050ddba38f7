"""DreamWaltz-G TPU command-line entry.

(reference: main.py:32-96 — pyrallis-parsed TrainConfig, dispatch to
eval / pretrain / nerf2gs / train, and the multi-prompt batch mode that
substitutes '@' in experiment paths per prompt-set entry.)

Usage:
    python main.py --stage nerf --guide.text "a wizard" --log.exp_name wiz/nerf
    python main.py --stage gs --render.from_nerf outputs/wiz/nerf/... \
        --guide.text "a wizard" --log.exp_name wiz/gs
    python main.py --log.eval_only true --optim.resume true ...
"""
import sys

from dreamwaltz_g_tpu.configs import TrainConfig, parse_args


def run(cfg: TrainConfig) -> None:
    """(reference: main.run, main.py:32-43)"""
    from dreamwaltz_g_tpu.training.trainer import Trainer

    trainer = Trainer(cfg)
    if cfg.optim.resume:
        try:
            trainer.load_checkpoint()
        except FileNotFoundError:
            pass
    if cfg.log.eval_only:
        trainer.full_eval()
    elif cfg.log.pretrain_only:
        trainer.pretrain()
    elif cfg.log.nerf2gs:
        trainer.pretrain_nerf2gs()
    elif cfg.log.nerf2mesh:
        trainer.export_mesh()
    else:
        trainer.train()


def run_multiple(cfg: TrainConfig) -> None:
    """Multi-prompt batch mode: '@' in exp_name is replaced per prompt
    (reference: run_multiple, main.py:44-85)."""
    from dreamwaltz_g_tpu.configs.prompts import get_avatar_list

    prompts = get_avatar_list(cfg.guide.text_set)
    base_exp = cfg.log.exp_name
    for slug, text in prompts:
        import copy

        c = copy.deepcopy(cfg)
        c.guide.text = text
        c.log.exp_name = base_exp.replace("@", slug) if "@" in base_exp \
            else f"{base_exp}/{slug}"
        try:
            run(c)
        except Exception as e:  # keep the batch going (reference: main.py:82-85)
            print(f"[run_multiple] prompt {text!r} failed: {e}",
                  file=sys.stderr)


def main(argv=None) -> None:
    cfg = parse_args(argv if argv is not None else sys.argv[1:])
    if cfg.log.platform:
        import jax

        jax.config.update("jax_platforms", cfg.log.platform)
    if cfg.guide.text_set:
        run_multiple(cfg)
    else:
        run(cfg)


if __name__ == "__main__":
    main()
