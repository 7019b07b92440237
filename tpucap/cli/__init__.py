"""CLI entry points — the reference's script surface as subcommands.

    python -m tpucap extract  --images DIR --encoder vgg16 --out features.npz
    python -m tpucap train    --tokens tokens.txt --features features.npz ...
    python -m tpucap caption  --image photo.jpg --checkpoint DIR ...
    python -m tpucap evaluate --tokens tokens.txt --split test.txt ...
    python -m tpucap bench    [bench.py args]

(SURVEY.md §2.1 layer A: feature extraction, dataset prep + tokenizer build,
train, generate/evaluate, BLEU scoring, single-image demo.)
"""

from tpucap.cli.main import main

__all__ = ["main"]
