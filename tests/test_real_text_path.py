"""Real text path: WordPiece over a genuine vocab format + schema-faithful
R2R_*_enc.json annotations through construct_instrs -> episodes (Weak #5 of
round 1: the first real-data run must not be the first execution)."""

import json

import pytest

import numpy as np

from vln_imagine_tpu.data.annotations import (
    AuxMetadata,
    construct_instrs,
    episodes_from_annotations,
)
from vln_imagine_tpu.data.tokenizer import BertWordPieceTokenizer, get_tokenizer
from vln_imagine_tpu.envx.synthetic import random_scan_graph

# bert-base-uncased layout: ids 0/100/101/102/103 for PAD/UNK/CLS/SEP/MASK
VOCAB = (["[PAD]"] + [f"[unused{i}]" for i in range(99)]
         + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
         + ["walk", "to", "the", "book", "##shelf", "and", "stop", "turn",
            "left", "right", ",", "."])


def _write_vocab(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_wordpiece_matches_bert_algorithm(tmp_path):
    tok = BertWordPieceTokenizer(_write_vocab(tmp_path))
    assert tok.cls_token_id == 101 and tok.sep_token_id == 102
    # greedy longest-match with ## continuation: 'bookshelf' -> book ##shelf
    assert tok.tokenize("Walk to the BOOKSHELF.") == \
        ["walk", "to", "the", "book", "##shelf", "."]
    # unknown word -> [UNK]
    assert tok.tokenize("zzz") == ["[UNK]"]
    ids = tok.encode("walk to the bookshelf", max_length=6)
    assert ids[0] == 101 and ids[-1] == 102 and len(ids) == 6
    # get_tokenizer(vocab_file=...) routes to the real WordPiece path
    tok2 = get_tokenizer(vocab_file=_write_vocab(tmp_path))
    assert isinstance(tok2, BertWordPieceTokenizer)
    assert tok2("turn left , stop")["input_ids"] == \
        [101, VOCAB.index("turn"), VOCAB.index("left"), VOCAB.index(","),
         VOCAB.index("stop"), 102]


def test_r2r_enc_json_round_trip(tmp_path):
    """A schema-faithful R2R_val_seen_enc.json (instructions +
    instr_encodings per path, heading, scan, path of viewpoint ids) flows
    through construct_instrs and episodes_from_annotations
    (data_utils.py:50-116 schema)."""
    g = random_scan_graph(np.random.default_rng(0), "sc77", 10)
    tok = BertWordPieceTokenizer(_write_vocab(tmp_path))
    instrs = ["walk to the bookshelf and stop .",
              "turn left , walk to the bookshelf .",
              "turn right and stop ."]
    item = {
        "distance": 7.5,
        "scan": "sc77",
        "path_id": 4332,
        "path": [g.node_ids[0], g.node_ids[1], g.node_ids[2]],
        "heading": 4.1,
        "instructions": instrs,
        "instr_encodings": [tok.encode(s, max_length=16) for s in instrs],
    }
    anno = tmp_path / "anno"
    anno.mkdir()
    (anno / "R2R_val_seen_enc.json").write_text(json.dumps([item]))

    items = construct_instrs(str(anno), "r2r", ["val_seen"])
    assert [it["instr_id"] for it in items] == ["4332_0", "4332_1", "4332_2"]
    assert items[1]["instruction"] == instrs[1]
    assert items[1]["instr_encoding"][0] == 101

    ep, ids = episodes_from_annotations(
        items, [g], AuxMetadata(), max_instr_len=16, max_gt_path_len=6,
        max_imaginations=4, imagine_feat_dim=8)
    assert ids == ["4332_0", "4332_1", "4332_2"]
    txt = np.asarray(ep.txt_ids)
    msk = np.asarray(ep.txt_mask)
    # every encoded id made it in, CLS first, mask covers exactly the ids
    for b, it in enumerate(items):
        enc = it["instr_encoding"]
        assert list(txt[b, :len(enc)]) == list(enc)
        assert msk[b].sum() == len(enc)
    np.testing.assert_array_equal(np.asarray(ep.gt_len), [3, 3, 3])
    np.testing.assert_array_equal(np.asarray(ep.start_heading),
                                  np.float32(4.1) * np.ones(3))


def test_wordpiece_matches_genuine_bert_tokenizer(tmp_path):
    """Byte-for-byte parity with transformers.BertTokenizer over the same
    vocab file on contractions, accented text, punctuation runs and control
    chars — the cases where a naive [a-z0-9']+ basic split diverges from
    bert-base-uncased's BasicTokenizer (lowercase + strip-accents +
    split-all-punctuation), desyncing ids from released pre-encoded
    annotations."""
    pytest.importorskip("transformers")
    from transformers import BertTokenizer

    vocab = (["[PAD]"] + [f"[unused{i}]" for i in range(99)]
             + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + ["walk", "to", "the", "book", "##shelf", "and", "stop",
                "turn", "left", "right", ",", ".", "don", "'", "t", "cafe",
                "entrance", "##s", "up", "stairs", "##stairs", "!", "?",
                "-", "past"])
    p = tmp_path / "vocab_full.txt"
    p.write_text("\n".join(vocab) + "\n")
    ref = BertTokenizer(str(p), do_lower_case=True)
    mine = BertWordPieceTokenizer(str(p))
    cases = [
        "Don't stop at the CAFÉ entrance.",
        "walk to the bookshelf and stop",
        "Turn left-right , then up the upstairs!?",
        "naïve café résumé",
        "walk\tpast\nthe    entrances .",
        "don''t don't",
        "zzz unknownword don'",
        # CJK ideographs isolate to single [UNK] tokens; control chars are
        # deleted (merging words); NBSP/ideographic space are whitespace;
        # Zl line separator splits (str.split semantics); Cf zero-width
        # chars delete
        "走到门口 walk past 门 the",
        "walk\x1cto\x7fthe",
        "walk\xa0to\u3000the",
        "walk\u2028to",
        "walk\ufeffto \x00the\ufffd.",
        "ｗａｌｋ ｔｏ",
    ]
    for c in cases:
        assert mine.tokenize(c) == ref.tokenize(c), c
        assert mine.encode(c) == ref.encode(c), c
