from .base import ChunkStats, Codec, Encoded, int_stats
from .columns import (
    decode_column,
    decode_column_chunk,
    encode_column,
    encode_column_chunk,
    select_int_codec,
)
from .fsst import FsstCodec, train_merges
from .ints import INT_CODECS
