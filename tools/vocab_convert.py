#!/usr/bin/env python
"""Vocabulary converter (reference: tools/orbvoc_binary_convertor.cc:11-27).

Converts a text codebook (one word per line, 8 uint32 values) to the binary
format, or generates a fresh seeded LSH codebook, and round-trip-verifies
the result like the reference tool does.

Usage:
    python tools/vocab_convert.py txt2bin IN.txt OUT.bin
    python tools/vocab_convert.py generate OUT.bin [num_words] [seed]
    python tools/vocab_convert.py info VOCAB.bin
    python tools/vocab_convert.py tree-txt2bin ORBvoc.txt OUT.bin
    python tools/vocab_convert.py tree-info VOCAB.bin

The tree-* commands operate on DBoW2-format hierarchical vocabularies
(the exact formats the reference reads/writes: loadFromTextFile /
loadFromBinaryFile, TemplatedVocabulary.h:1248/1358) — `tree-txt2bin` is
the reference's orbvoc_binary_convertor with the same round-trip check.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# host-side tool: never route the tiny codebook ops through an accelerator
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main(argv):
    from orb_slam_fusion_tpu.place.vocabulary import (
        load_vocabulary_binary, load_vocabulary_text, make_vocabulary,
        save_vocabulary_binary)

    cmd = argv[1] if len(argv) > 1 else "help"
    if cmd == "txt2bin":
        voc = load_vocabulary_text(argv[2])
        save_vocabulary_binary(argv[3], voc)
        back = load_vocabulary_binary(argv[3])
        assert (np.asarray(back.words) == np.asarray(voc.words)).all(), \
            "round-trip mismatch"
        print(f"{argv[3]}: {voc.words.shape[0]} words (round-trip verified)")
    elif cmd == "generate":
        n = int(argv[3]) if len(argv) > 3 else 4096
        seed = int(argv[4]) if len(argv) > 4 else 7
        voc = make_vocabulary(n, seed)
        save_vocabulary_binary(argv[2], voc)
        print(f"{argv[2]}: generated {n} words (seed {seed})")
    elif cmd == "info":
        voc = load_vocabulary_binary(argv[2])
        print(f"{argv[2]}: {voc.words.shape[0]} words, 256-bit")
    elif cmd == "tree-txt2bin":
        from orb_slam_fusion_tpu.place.tree_vocabulary import (
            load_tree_binary, load_tree_text, save_tree_binary)
        voc, levels = load_tree_text(argv[2])
        save_tree_binary(argv[3], voc, levels)
        back, back_levels = load_tree_binary(argv[3])
        assert back_levels == levels
        assert (np.asarray(back.node_desc) == np.asarray(voc.node_desc)).all()
        assert (np.asarray(back.word_weight)
                == np.asarray(voc.word_weight)).all()
        print(f"{argv[3]}: k={voc.branching} L={levels} "
              f"{voc.num_words} words (round-trip verified)")
    elif cmd == "tree-info":
        from orb_slam_fusion_tpu.place.tree_vocabulary import load_tree_binary
        voc, levels = load_tree_binary(argv[2])
        print(f"{argv[2]}: k={voc.branching} L={levels} "
              f"{voc.num_words} words, {voc.node_desc.shape[0]} nodes")
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
