import pytest

from gitax.tokenization import (
    BasicTokenizer,
    BertTokenizer,
    WordpieceTokenizer,
    build_tiny_vocab,
    CLS_ID,
    SEP_ID,
    PAD_ID,
    UNK_ID,
    MASK_ID,
)


@pytest.fixture(scope="module")
def tok():
    vocab = build_tiny_vocab(
        words=[
            "a",
            "couple",
            "of",
            "boats",
            "in",
            "large",
            "body",
            "water",
            "##s",
            "boat",
            "dog",
            "run",
            "##ning",
            "don",
            "##'",
            "##t",
        ]
    )
    return BertTokenizer(vocab)


def test_special_token_ids(tok):
    assert tok.pad_token_id == PAD_ID == 0
    assert tok.unk_token_id == UNK_ID == 100
    assert tok.cls_token_id == CLS_ID == 101
    assert tok.sep_token_id == SEP_ID == 102
    assert tok.mask_token_id == MASK_ID == 103
    assert tok.vocab_size == 30522


def test_basic_tokenizer_lower_and_punct():
    bt = BasicTokenizer(do_lower_case=True)
    assert bt.tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert bt.tokenize("  spaced\tout\n") == ["spaced", "out"]
    # accents stripped
    assert bt.tokenize("café") == ["cafe"]


def test_basic_tokenizer_cjk():
    bt = BasicTokenizer()
    assert bt.tokenize("ab中cd") == ["ab", "中", "cd"]


def test_wordpiece_greedy_longest_match(tok):
    wp = WordpieceTokenizer(tok.vocab)
    assert wp.tokenize("running") == ["run", "##ning"]
    assert wp.tokenize("boats") == ["boats"]  # whole word wins over pieces


def test_encode_decode_roundtrip(tok):
    text = "a couple of boats in a large body of water."
    ids = tok(text, add_special_tokens=False)["input_ids"]
    assert all(isinstance(i, int) for i in ids)
    decoded = tok.decode([tok.cls_token_id] + ids + [tok.sep_token_id],
                         skip_special_tokens=True)
    assert decoded == text


def test_decode_skips_special_tokens(tok):
    ids = [CLS_ID, tok.vocab["dog"], SEP_ID, PAD_ID, PAD_ID]
    assert tok.decode(ids, skip_special_tokens=True) == "dog"
    # HF-matching default: specials render as text
    assert tok.decode(ids) == "[CLS] dog [SEP] [PAD] [PAD]"


def test_truncation(tok):
    ids = tok("a a a a a a", add_special_tokens=False, truncation=True, max_length=3)
    assert len(ids["input_ids"]) == 3


def test_unknown_word_maps_to_unk(tok):
    # '€' is neither in the tiny vocab nor splittable into known pieces
    ids = tok("€", add_special_tokens=False)["input_ids"]
    assert ids == [tok.unk_token_id]


def test_cleanup_contractions(tok):
    # "don ' t" pieces decode through cleanup to "don't"
    ids = tok("don't", add_special_tokens=False)["input_ids"]
    assert tok.decode(ids) == "don't"


def test_reference_prefix_convention(tok):
    """[CLS] + last (max_len-2) payload tokens (reference inference.py:92-101)."""
    max_text_len = 8
    enc = tok(
        "a a a a a a a a a a",
        padding="do_not_pad",
        truncation=True,
        add_special_tokens=False,
        max_length=max_text_len,
    )
    payload = enc["input_ids"]
    if len(payload) > max_text_len - 2:
        payload = payload[-(max_text_len - 2):]
    input_ids = [tok.cls_token_id] + payload
    assert len(input_ids) == max_text_len - 1
    assert input_ids[0] == CLS_ID
