"""Place recognition: binary-descriptor vocabularies + keyframe database.

Replaces DBoW2 (3rdparty/DBoW2: TemplatedVocabulary k=10 L=5 tree + inverted
file + TF-IDF L1 scoring). Two TPU-native vocabulary designs are provided:

* `vocabulary.BinaryVocabulary` — a FLAT codebook: every descriptor
  quantizes against every word in one XOR+popcount pass (an LSH). The
  CPU tree exists to make quantization O(k*L) per descriptor; a flat
  batched pass is simpler and fast enough for small codebooks. Default.
* `tree_vocabulary.TreeVocabulary` — the reference's hierarchical tree,
  reformulated as a fixed-depth batched descent (L gather+popcount+argmin
  rounds over all descriptors at once). Loads/saves both DBoW2
  interchange formats (ORBvoc.txt text and the fork's packed binary), so
  vocabularies trained for the reference drop in; also exposes the
  direct-index node ids that bucket SearchByBoW matching
  (frontend.matcher.search_by_bow).

The inverted file exists to sparsify CPU scoring; on TPU the database is
a dense (max_kf x vocab) TF-IDF matrix and a query scores against ALL
keyframes in one fused pass — no pointer chasing, and the L1 scoring
matches the reference's formulation exactly.
"""

from .vocabulary import BinaryVocabulary, make_vocabulary, quantize, bow_vector  # noqa: F401
from .tree_vocabulary import (  # noqa: F401
    TreeVocabulary, train_vocabulary, quantize_tree, bow_vector_tree,
    load_tree_text, save_tree_text, load_tree_binary, save_tree_binary)
from .database import KeyFrameDatabase  # noqa: F401
