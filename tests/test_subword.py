"""Pure-Python tokenizer.json loader (O5 real path): WordPiece golden
ids, Unigram Viterbi golden ids, normalizer/pre-tokenizer behavior, and
the encode_batch + OnnxScorer wiring contract.

The fixtures are real HF-format tokenizer.json files; ids below are
hand-derived from the published algorithms (greedy longest-prefix for
WordPiece; max-sum-of-log-probs Viterbi for Unigram, Kudo 2018 §3) —
the same outputs the reference's tokenizers-cpp FFI produces for these
configs (/root/reference/src/processor.cpp:64-81)."""

import os

import pytest

from gliner_spark.kernels.subword import (
    SubwordTokenizer,
    encoder_from_file,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
WP = os.path.join(FIX, "wordpiece_tokenizer.json")
UNI = os.path.join(FIX, "unigram_tokenizer.json")


@pytest.fixture(scope="module")
def wp():
    return encoder_from_file(WP)


@pytest.fixture(scope="module")
def uni():
    return encoder_from_file(UNI)


def test_wordpiece_golden_ids(wp):
    # the canonical WordPiece example: un + ##aff + ##able
    assert wp("unaffable") == [4, 5, 6]
    assert wp("affable") == [8, 6]
    # BertNormalizer lowercase
    assert wp("Kyiv") == [9]
    assert wp("KYIV") == [9]
    # strip_accents defaults to the lowercase flag when null (HF rule)
    assert wp("résumé") == [20]
    # greedy longest-prefix: "world" matches whole before "wor"+"##ld",
    # including as the first piece of a longer word
    assert wp("world") == [11]
    assert wp("worlded") == [11, 7]  # world + ##ed (NOT wor+##ld+##ed)


def test_added_tokens_match_raw_before_pipeline(wp):
    """The HF added-vocabulary rule: <<ENT>>/<<SEP>> resolve to their
    single registered ids on the RAW input — lowercasing or the
    punctuation splitter must never touch them (GLiNER registers its
    prompt markers exactly this way)."""
    assert wp("<<ENT>>") == [30]
    assert wp("<<SEP>>") == [31]
    # non-registered angle soup still goes through the normal pipeline
    assert wp("<<OTHER>>") != [30]


def test_wordpiece_unk_and_punct(wp):
    # unmatched remainder -> whole word is [UNK] (BERT rule, not partial)
    assert wp("xyz") == [1]
    assert wp("unxyz") == [1]
    # BertPreTokenizer isolates punctuation before the model
    assert wp("hello!") == [10, 13]
    assert wp("ukraine.") == [17, 19]


def test_unigram_viterbi_golden_ids(uni):
    # Metaspace prepends the word-boundary marker before Viterbi:
    # [▁hello] = -3.0 beats [▁h,ello] = -6.0 and [▁,hell,o] = -7.0
    assert uni("hello") == [2]
    # [▁world] = -4.5 beats [▁wor,ld] = -5.0
    assert uni("world") == [10]
    # no single piece covers "kyivo": best lattice = [▁kyiv, o]
    assert uni("kyivo") == [7, 4]
    # per-char unk fallback keeps the lattice connected, and adjacent
    # unks FUSE into one id (fuse_unk — SentencePiece/HF behavior): ▁ +
    # one fused <unk> covering the qqq run
    assert uni("qqq") == [1, 0]
    assert uni("") == []


def test_unigram_fuse_unk_only_merges_adjacent():
    from gliner_spark.kernels.subword import UnigramEncoder

    vocab = [("<unk>", 0.0), ("a", -1.0)]
    enc = UnigramEncoder(vocab, unk_id=0)  # fuse_unk defaults on
    assert enc.encode_piece("zz") == [0]          # adjacent unks fuse
    assert enc.encode_piece("zaz") == [0, 1, 0]   # separated unks don't
    unfused = UnigramEncoder(vocab, unk_id=0, fuse_unk=False)
    assert unfused.encode_piece("zz") == [0, 0]


def test_wordpiece_max_chars_and_metaspace_replacement(wp):
    # BERT rule: words longer than max_input_chars_per_word are [UNK]
    # wholesale, never partially matched
    assert wp("a" * 101) == [1]
    # Metaspace replaces interior spaces too (multi-word "word" input)
    from gliner_spark.kernels.subword import SubwordTokenizer

    tok = SubwordTokenizer(
        {
            "pre_tokenizer": {"type": "Metaspace", "replacement": "▁",
                              "prepend_scheme": "always"},
            "model": {"type": "Unigram", "unk_id": 0,
                      "vocab": [["<unk>", 0.0], ["▁a", -1.0],
                                ["▁b", -1.0]]},
        }
    )
    assert tok.encode_word("a b") == [1, 2]


BPE = os.path.join(FIX, "bpe_tokenizer.json")


@pytest.fixture(scope="module")
def bpe():
    return encoder_from_file(BPE)


def test_bpe_golden_ids(bpe):
    """Rank-greedy merge loop (GPT-2/RoBERTa BPE) behind the ByteLevel
    pre-tokenizer: add_prefix_space turns 'hello' into 'Ġhello', then
    merges apply lowest-rank-first until none remain."""
    assert bpe("hello") == [9]          # full merge chain to Ġhello
    assert bpe("world") == [11, 4, 14, 3, 13]  # only Ġ+w is ranked
    # all adjacent occurrences of the chosen pair merge left-to-right
    assert bpe("lll") == [0, 6, 3]      # Ġ + ll + l
    # GPT-2 regex isolates contractions; each piece encodes separately
    assert bpe("don't") == [20, 17]     # Ġdon + 't
    # unmatched symbol -> unk_token id (per symbol, not whole word)
    assert bpe("x") == [0, 12]          # Ġ + <unk>
    # added tokens still match on the raw input
    assert bpe("<<ENT>>") == [30]


def test_bpe_subword_prefix_and_suffix():
    """continuing_subword_prefix decorates interior symbols (and is
    stripped from the right side on merge); end_of_word_suffix
    decorates the final symbol — HF BPE model semantics."""
    from gliner_spark.kernels.subword import BPEEncoder

    enc = BPEEncoder(
        {"a": 0, "##b": 1, "##c": 2, "ab": 3},
        ["a ##b"], continuing_subword_prefix="##",
    )
    assert enc.encode_piece("abc") == [3, 2]  # ab (merged) + ##c

    eow = BPEEncoder(
        {"a": 0, "b</w>": 1, "ab</w>": 2},
        ["a b</w>"], end_of_word_suffix="</w>",
    )
    assert eow.encode_piece("ab") == [2]


def test_bpe_byte_fallback_and_fuse_unk():
    from gliner_spark.kernels.subword import BPEEncoder

    fb = BPEEncoder(
        {"a": 0, "<0xC3>": 1, "<0xA9>": 2}, [], byte_fallback=True,
    )
    assert fb.encode_piece("aé") == [0, 1, 2]  # é -> UTF-8 byte ids

    fu = BPEEncoder({"a": 0, "<unk>": 9}, [], unk_token="<unk>",
                    fuse_unk=True)
    assert fu.encode_piece("axxa") == [0, 9, 0]

    # no unk and no fallback: HF drops the unknown symbol
    drop = BPEEncoder({"a": 0}, [])
    assert drop.encode_piece("axa") == [0, 0]


def test_gpt2_split_scanner():
    from gliner_spark.kernels.subword import _gpt2_split

    assert _gpt2_split(" hello") == [" hello"]
    assert _gpt2_split(" don't stop") == [" don", "'t", " stop"]
    assert _gpt2_split("ab12cd") == ["ab", "12", "cd"]
    assert _gpt2_split(" x!!y") == [" x", "!!", "y"]


def test_precompiled_charsmap_real_decoder():
    """The SentencePiece double-array-trie charsmap, decoded for real:
    mappings where charsmap != NFKC prove the NFKC approximation is
    gone. Fixture blob built by tools/spm_charsmap.py (the encoder side
    of the same published format)."""
    import base64
    import sys
    import unicodedata

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.spm_charsmap import build_charsmap

    zwsp = chr(0x200B)
    blob = build_charsmap({
        chr(0xE9): "e",        # é -> e: NFKC keeps é, charsmap must win
        zwsp: "",              # deletion mapping
        chr(0xFB01): "fi",     # ligature (NFKC-agreeing entry)
        "abc": "X", "ab": "Y",  # longest-match over shared prefixes
    })
    assert unicodedata.normalize("NFKC", chr(0xE9)) == chr(0xE9)

    tok = SubwordTokenizer({
        "normalizer": {"type": "Precompiled",
                       "precompiled_charsmap":
                           base64.b64encode(blob).decode("ascii")},
        "model": {"type": "WordPiece", "unk_token": "[UNK]",
                  "vocab": {"[UNK]": 0, "cafe": 1, "fin": 2, "xXz": 3,
                            "xYz": 4, "plain": 5}},
    })
    assert tok.encode_word("caf" + chr(0xE9)) == [1]       # byte-exact
    assert tok.encode_word("fi" + zwsp + "n") == [2]
    assert tok.encode_word("xabcz") == [3]                  # abc -> X
    assert tok.encode_word("xabz") == [4]                   # ab  -> Y
    assert tok.encode_word("plain") == [5]                  # passthrough

    # bytes with no trie cell at all (xor past the array end on a
    # compact fixture trie) must read as "no match", never IndexError
    from gliner_spark.kernels.subword import _Charsmap
    from tools.spm_charsmap import build_charsmap

    tiny = _Charsmap(build_charsmap({"ab": "X"}))
    assert tiny.normalize("ÿ￿ plain") == "ÿ￿ plain"


def test_encode_batch_over_pure_tokenizer(wp):
    """The loader plugs into the O4-O6 composition unchanged: 6-tensor
    layout with BOS/EOS and words_mask on first subwords of text words."""
    import numpy as np

    from gliner_spark.kernels.encode import encode_batch

    toks = [[(0, 9, "unaffable"), (10, 15, "world")]]
    enc = encode_batch(toks, ["city"], wp, max_width=12)
    row = enc.input_ids[0]
    # prompt: <<ENT>>/<<SEP>> hit the ADDED-TOKEN vocabulary (single
    # ids 30/31, the GLiNER prompt-marker rule — matched on raw input
    # before normalization), "city" -> 22 (in-vocab since the tiny-ONNX
    # graph needs distinct label-name ids);
    # layout: BOS, 30, city, 31, un, ##aff, ##able, world, EOS
    assert row[:9].tolist() == [1, 30, 22, 31, 4, 5, 6, 11, 2]
    assert enc.attention_mask[0, :9].tolist() == [1] * 9
    wm = enc.words_mask[0]
    assert wm[4] == 1 and wm[7] == 2  # first subword of each text word
    assert wm[5] == 0 and wm[6] == 0  # continuation subwords stay 0
    assert enc.text_lengths.tolist() == [[2]]
    assert enc.num_words == 2
    assert isinstance(enc.span_idx, np.ndarray)


import json

from hypothesis import given, settings
from hypothesis import strategies as st

with open(WP, encoding="utf-8") as _f:
    _WP_VOCAB = {v: k for k, v in json.load(_f)["model"]["vocab"].items()}
with open(UNI, encoding="utf-8") as _f:
    _UNI_VOCAB = [t for t, _ in json.load(_f)["model"]["vocab"]]
_WP_ENC = encoder_from_file(WP)
_UNI_ENC = encoder_from_file(UNI)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abdefiklnorsuvwy", min_size=1, max_size=14))
def test_wordpiece_pieces_reconstruct_word(word):
    """Soundness property: whenever WordPiece does NOT bail to [UNK],
    concatenating the matched pieces (## stripped) must reproduce the
    normalized word exactly — greedy matching can never skip or
    duplicate characters."""
    ids = _WP_ENC(word)
    assert ids
    if 1 not in ids:  # 1 = [UNK]
        joined = "".join(
            _WP_VOCAB[i][2:] if _WP_VOCAB[i].startswith("##") else _WP_VOCAB[i]
            for i in ids
        )
        assert joined == word


with open(UNI, encoding="utf-8") as _f:
    _UNI_CFG = json.load(_f)
    _UNI_CFG["model"]["fuse_unk"] = False  # 1 unk id == 1 char, exactly
_UNI_UNFUSED = SubwordTokenizer(_UNI_CFG).encode_word


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="dehiklmorvwy", min_size=1, max_size=14))
def test_unigram_lattice_covers_every_char(word):
    """Viterbi soundness: the chosen segmentation consumes the
    metaspace-prefixed word exactly once — vocab pieces consume their
    own length, each unk consumes one character (fuse_unk disabled so
    the per-char accounting stays tight)."""
    ids = _UNI_UNFUSED(word)
    consumed = sum(1 if i == 0 else len(_UNI_VOCAB[i]) for i in ids)
    assert consumed == len("▁" + word)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="abc", min_size=1, max_size=8))
def test_unigram_viterbi_is_optimal_vs_bruteforce(word):
    """DP optimality: on a dense synthetic vocab (every 1-3 gram of
    {a,b,c} with deterministic scores), Viterbi's total log-prob must
    equal the max over ALL exhaustive segmentations."""
    from itertools import product

    from gliner_spark.kernels.subword import UnigramEncoder

    grams = ["".join(p) for n in (1, 2, 3)
             for p in product("abc", repeat=n)]
    vocab = [("<unk>", 0.0)] + [
        (g, -1.0 - (hash_val := sum(ord(c) for c in g) % 7) * 0.3)
        for g in grams
    ]
    enc = UnigramEncoder(vocab, unk_id=0)
    scores = {t: s for t, s in vocab}

    ids = enc.encode_piece(word)
    toks = [vocab[i][0] for i in ids]
    assert "".join(toks) == word
    got = sum(scores[t] for t in toks)

    def best(s: str) -> float:
        if not s:
            return 0.0
        return max(
            scores[s[:k]] + best(s[k:])
            for k in range(1, min(3, len(s)) + 1)
        )

    assert abs(got - best(word)) < 1e-9


def test_onnx_scorer_falls_back_to_pure_loader():
    """Without the `tokenizers` wheel, OnnxScorer._encode_word must load
    the tokenizer.json through kernels/subword.py (the sandbox has no
    wheel, so this exercises the real fallback branch)."""
    from gliner_spark.kernels.scorer import OnnxScorer

    scorer = OnnxScorer("unused-model", WP)
    try:
        enc = scorer._encode_word()
        assert enc("unaffable") == [4, 5, 6]
    finally:
        OnnxScorer._tokenizers.pop(WP, None)


def test_kyiv_golden_through_onnx_scorer_path(tmp_path):
    """End-to-end through the REAL OnnxScorer path on Spark: the pure
    tokenizer.json loader encodes the words, encode_batch builds the
    6-tensor feed, a token-id-keyed mock stands in for the graph, and
    the reference Kyiv golden (tests/test.cpp:80-114) comes out of
    extract_mentions with exact byte offsets — narrowing the
    mock-verified gap to the ONNX forward itself."""
    from gliner_spark.kernels.scorer import OnnxScorer
    from gliner_spark.operators.ner import extract_mentions
    from gliner_spark.session import build_session

    spark = build_session(app_name="gliner-tests", cores=4)

    class _KyivSession:
        """Stands in for the ONNX graph ONLY: reads the same feeds the
        real session gets (ids + words_mask + span tensors), emits +5
        logits for the 'kyiv'/'ukraine' subword ids at width 0.
        Everything else — pure tokenizer, 6-tensor layout, feed
        construction, logit reshape, sigmoid decode, byte offsets,
        greedy — is the production path. (Defined inside the test so
        cloudpickle ships it by value to the Python workers.)"""

        MAX_WIDTH = 12

        def run(self, outputs, feeds):
            import numpy as np

            assert outputs == ["logits"]
            ids = feeds["input_ids"]
            wm = feeds["words_mask"]
            bsz = ids.shape[0]
            num_words = feeds["span_mask"].shape[1] // self.MAX_WIDTH
            lg = np.full((bsz, num_words, self.MAX_WIDTH, 2), -12.0,
                         dtype=np.float32)
            for b in range(bsz):
                for t in range(ids.shape[1]):
                    w = int(wm[b, t])
                    if w > 0:
                        if ids[b, t] == 9:   # 'kyiv' piece id (fixture)
                            lg[b, w - 1, 0, 0] = 5.0
                        if ids[b, t] == 17:  # 'ukraine'
                            lg[b, w - 1, 0, 1] = 5.0
            return [lg.reshape(-1)]

    def factory():
        # registration must happen IN the executor-side Python worker:
        # OnnxScorer._sessions is per-process state
        OnnxScorer._sessions["e2e-model@-1"] = _KyivSession()
        return OnnxScorer("e2e-model", WP, max_width=12)

    docs = spark.createDataFrame(
        [("d1", "Kyiv is the capital of Ukraine."), ("d2", "hello world")],
        "doc_id string, text string",
    )
    rows = sorted(
        tuple(r)
        for r in extract_mentions(
            docs, ["city", "country"], id_col="doc_id",
            scorer_factory=factory,
        ).collect()
    )
    sig = round(1.0 / (1.0 + 2.718281828459045 ** -5.0), 4)
    assert rows == [
        ("d1", 0, 4, "Kyiv", "city", sig),
        ("d1", 23, 30, "Ukraine", "country", sig),
    ]
