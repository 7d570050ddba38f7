"""Named avatar prompt sets for batch runs (reference: configs/prompts.py).

``get_avatar_list(name)`` returns a list of (short_name, full_prompt) pairs;
``--guide.text_set name`` or ``name,lo-hi`` selects a slice, mirroring the
reference's multi-prompt batch mode (reference: main.py:44-85).
"""
from typing import Dict, List, Tuple

Prompt = Tuple[str, str]

_SUFFIX = ", full body, 3d model, best quality, highly detailed"

PROMPT_SETS: Dict[str, List[Prompt]] = {
    # a compact default demo set (the reference ships 60+ celebrity prompts;
    # supply your own sets here or via a JSON file)
    "demo": [
        ("wizard", "a wizard with a long beard wearing a blue robe and pointed hat" + _SUFFIX),
        ("knight", "a medieval knight in polished steel plate armor" + _SUFFIX),
        ("astronaut", "an astronaut in a white space suit with gold visor" + _SUFFIX),
        ("chef", "a cheerful chef in a white uniform and toque" + _SUFFIX),
        ("pirate", "a pirate captain with a tricorn hat and red coat" + _SUFFIX),
        ("robot", "a sleek humanoid robot with glowing blue accents" + _SUFFIX),
        ("ballerina", "a ballerina in a white tutu" + _SUFFIX),
        ("firefighter", "a firefighter in full turnout gear with helmet" + _SUFFIX),
        ("samurai", "a samurai wearing ornate lacquered armor" + _SUFFIX),
        ("detective", "a detective in a trench coat and fedora" + _SUFFIX),
        ("viking", "a viking warrior with a braided beard and fur cloak" + _SUFFIX),
        ("sorceress", "a sorceress in a flowing purple gown with silver jewelry" + _SUFFIX),
    ],
    "characters": [
        ("clown", "a circus clown with colorful costume and face paint" + _SUFFIX),
        ("superhero", "a superhero in a red and blue suit with a cape" + _SUFFIX),
        ("cowboy", "a cowboy with a leather vest, boots and wide-brim hat" + _SUFFIX),
        ("monk", "a buddhist monk in saffron robes" + _SUFFIX),
        ("queen", "an elegant queen in a golden gown and crown" + _SUFFIX),
        ("scientist", "a scientist wearing a lab coat and safety goggles" + _SUFFIX),
    ],
}


def get_avatar_list(name: str) -> List[Prompt]:
    """Resolve a prompt set spec: 'demo' or 'demo,2-5' (1-based inclusive
    slice like the reference's text_set ranges)."""
    if "," in name:
        name, rng = name.split(",", 1)
        lo, hi = (int(x) for x in rng.split("-")) if "-" in rng else (int(rng), int(rng))
    else:
        lo, hi = 1, None
    prompts = PROMPT_SETS[name]
    return prompts[lo - 1: hi] if hi is not None else prompts[lo - 1:]
