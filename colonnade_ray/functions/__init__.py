from .dedup import (
    dup_groups,
    exact_dedup,
    near_dup_pairs,
    simhash_signatures,
    winnow_fingerprints,
    winnow_overlap_pairs,
)
from .relational import asof_join, broadcast_join, hash_join, sessionize
from .sequences import pack_sequences, remap_tokens, truncate_tokens_batch
from .similarity import (
    brute_force_topk,
    cosine_pairs_exact,
    embedding_near_dup_candidates,
    ivf_topk,
)
from .multimodal import (
    decode_ppm,
    decode_wav,
    extract_media_features,
    resize_images,
    sample_frames,
    split_ppm_stream,
    stdlib_decoder,
)
from .relational import hopping_windows
from .text import HashTokenizer, LanguageId, QualityScorer, token_count_batch, word_freq
from .bpe import bpe_segment, bpe_train_corpus, char_pair_counts
