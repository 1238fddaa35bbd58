"""Native C++ library tests: TFRecord framing parity with TF, action codec
parity with the numpy tokenizer."""

import numpy as np
import pytest

from bridgelang_tpu import native

if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
    assert native.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert native.crc32c(b"123456789") == 0xE3069283


def test_tfrecord_roundtrip(tmp_path):
    path = tmp_path / "test.tfrecord"
    records = [b"hello", b"world" * 100, b"", b"\x00\xff" * 33]
    with native.TFRecordWriter(str(path)) as w:
        for r in records:
            w.write(r)
    assert list(native.read_tfrecords(str(path))) == records
    assert native.count_records(str(path)) == len(records)


def test_tfrecord_interops_with_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = tmp_path / "tf_written.tfrecord"
    with tf.io.TFRecordWriter(str(path)) as w:
        w.write(b"alpha")
        w.write(b"beta" * 50)
    assert list(native.read_tfrecords(str(path))) == [b"alpha", b"beta" * 50]

    # and TF reads ours
    ours = tmp_path / "native_written.tfrecord"
    with native.TFRecordWriter(str(ours)) as w:
        w.write(b"gamma")
    got = [bytes(x.numpy()) for x in tf.data.TFRecordDataset(str(ours))]
    assert got == [b"gamma"]


def test_corruption_detected(tmp_path):
    path = tmp_path / "corrupt.tfrecord"
    with native.TFRecordWriter(str(path)) as w:
        w.write(b"payload-payload")
    raw = bytearray(path.read_bytes())
    raw[14] ^= 0xFF  # flip a payload byte
    path.write_bytes(bytes(raw))
    with pytest.raises(OSError):
        list(native.read_tfrecords(str(path)))
    # integrity check off -> reads (corrupted) record
    assert native.count_records(str(path), check_crc=False) == 1


def test_action_codec_matches_numpy_tokenizer():
    from bridgelang_tpu.vla.action_tokenizer import ActionTokenizer

    class Tok:
        vocab_size = 32000

        def decode(self, ids):
            return ""

        def batch_decode(self, b):
            return []

    at = ActionTokenizer(Tok())
    rng = np.random.default_rng(0)
    actions = rng.uniform(-1.3, 1.3, size=(64, 7)).astype(np.float32)
    np.testing.assert_array_equal(native.actions_to_tokens(actions), at.encode_to_ids(actions))
    tokens = at.encode_to_ids(actions).astype(np.int32)
    np.testing.assert_allclose(
        native.tokens_to_actions(tokens), at.decode_token_ids_to_actions(tokens), atol=1e-6
    )
