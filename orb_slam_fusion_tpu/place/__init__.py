"""Place recognition: binary-descriptor vocabulary + keyframe database.

Replaces DBoW2 (3rdparty/DBoW2: TemplatedVocabulary k=10 L=5 tree + inverted
file + TF-IDF L1 scoring). The TPU-native redesign flattens the structure:

* the hierarchical tree exists to make CPU quantization O(k*L) per
  descriptor; on TPU a FLAT codebook quantizes every descriptor against
  every word in one XOR+popcount pass (an LSH, dense and batched), so the
  tree disappears;
* the inverted file exists to sparsify CPU scoring; on TPU the database is
  a dense (max_kf x vocab) TF-IDF matrix and a query scores against ALL
  keyframes in one fused kernel — no pointer chasing, and the L1 scoring
  matches the reference's formulation exactly;
* the direct index (feature bucketing for matching) is unnecessary — the
  matcher already brute-forces masked Hamming distances.
"""

from .vocabulary import BinaryVocabulary, make_vocabulary, quantize, bow_vector  # noqa: F401
from .database import KeyFrameDatabase  # noqa: F401
