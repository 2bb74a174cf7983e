"""Pin gitax's offline WordPiece tokenizer to HF's slow BertTokenizer.

Byte-for-byte output parity of the public entry points hangs on exact
tokenizer equivalence (encode ids, decode text, cleanup), so this is
tested directly against the installed `transformers` BertTokenizer over
a golden set of adversarial strings — CJK, accents, control chars,
over-long UNK words, punctuation/contraction cleanup — plus decode
round-trips with special-token skipping (VERDICT r1 weak #6).
"""

import os.path as op
import sys

import pytest

transformers = pytest.importorskip("transformers")

sys.path.insert(0, op.dirname(op.abspath(__file__)))

from e2e_common import make_bert_vocab

from gitax.tokenization import BertTokenizer as GitaxTokenizer

GOLDEN_STRINGS = [
    "",
    " ",
    # literal special-token strings must stay atomic (HF split_on_tokens)
    "hello [SEP] world",
    "a[SEP]b",
    "[UNK]x",
    "x [MASK][CLS] hello",
    "[PAD]hello[PAD]",
    "a man holding a dog",
    "A Man HOLDING a DOG!",
    "don't stop, won't stop.",
    "it's the cat's toy; isn't it?",
    "naive cafe visitors",
    "naïve café über",  # accents: strip to ascii under lowercase
    "中文日本語",  # CJK: per-char split
    "mixed 中 text 文 words",
    "supercalifragilisticexpialidocious",  # no wordpiece path -> [UNK]
    "x" * 150,  # > max_input_chars_per_word -> [UNK]
    "  multiple   spaces\tand\nnewlines  ",
    "trailing punctuation...",
    "(parenthetical) [bracketed] {braced}",
    "semi;colon:ed,comma'd\"quoted\"",
    "1930s numbers 123 456.789",
    "hyphen-ated co-op re-use",
    "email@example.com http://a.b/c?d=e",
    "\x00controlchars�here",
    "emoji \U0001f600 stays unknown",
    "ALL CAPS SENTENCE WITH, PUNCT!",
    "word " * 60,  # longer than typical max_text_len
]


@pytest.fixture(scope="module")
def vocabs(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vocab") / "vocab.txt")
    make_bert_vocab(path)
    hf = transformers.BertTokenizer(path, do_lower_case=True)
    ours = GitaxTokenizer.from_vocab_file(path)
    return hf, ours


@pytest.mark.parametrize("text", GOLDEN_STRINGS)
def test_tokenize_matches_hf(vocabs, text):
    hf, ours = vocabs
    assert ours.tokenize(text) == hf.tokenize(text)


@pytest.mark.parametrize("text", GOLDEN_STRINGS)
def test_encode_call_matches_hf(vocabs, text):
    """The exact call signature the CLIs use (inference.py:92-101)."""
    hf, ours = vocabs
    kwargs = dict(
        padding="do_not_pad", truncation=True, add_special_tokens=False,
        max_length=40,
    )
    assert ours(text, **kwargs)["input_ids"] == hf(text, **kwargs)["input_ids"]


@pytest.mark.parametrize("text", GOLDEN_STRINGS)
def test_decode_roundtrip_matches_hf(vocabs, text):
    hf, ours = vocabs
    ids = hf(text, padding="do_not_pad", truncation=True,
             add_special_tokens=True, max_length=64)["input_ids"]
    for skip in (True, False):
        assert ours.decode(ids, skip_special_tokens=skip) == hf.decode(
            ids, skip_special_tokens=skip
        )


def test_decode_cleanup_sequences(vocabs):
    """clean_up_tokenization punctuation/contraction joins
    (HF: " ." -> ".", " n't" -> "n't", " 's" -> "'s", ...)."""
    hf, ours = vocabs
    # build id sequences straight from tokens so cleanup cases are exact
    for tokens in (
        ["a", "dog", ".", "a", "cat", ",", "a", "man", "?"],
        ["do", "##n", "'", "t"],
        ["it", "'", "s"],
        ["he", "'", "re"],
        ["i", "'", "m", "fine"],
        ["don", "'", "t", "do", "n't"],
    ):
        ids = [hf.vocab.get(t, hf.vocab["[UNK]"]) for t in tokens]
        assert ours.decode(ids) == hf.decode(ids), tokens


def test_special_ids_match_hf(vocabs):
    hf, ours = vocabs
    assert ours.cls_token_id == hf.cls_token_id
    assert ours.sep_token_id == hf.sep_token_id
    assert ours.pad_token_id == hf.pad_token_id
    assert ours.unk_token_id == hf.unk_token_id
    assert ours.mask_token_id == hf.mask_token_id
    assert set(ours.all_special_ids) == set(hf.all_special_ids)
