"""Parquet Modular Encryption for delete files (pyarrow-side).

The reference encrypts delete files with per-file random keys exactly
like data files (ducklake_delete.cpp:63-70; key recorded in
ducklake_delete_file.encryption_key). Data files here are written by
Spark, so they use the Java CryptoFactory (java/ducklake); delete
files are written executor-side with pyarrow, so they use pyarrow's
PME with the SAME catalog-key model:

- one random 128-bit key per delete file, base64 in the catalog;
- standard PME bytes on disk (encrypted footer, AES-GCM) — the file
  is unreadable without its catalog key;
- key wrapping: PME generates random DEKs (footer + column groups) and
  asks the "KMS" to wrap each under the catalog (master) key. The wrap
  is ``salt || (DEK XOR HMAC-SHA256(master, salt))`` with a fresh
  random salt per wrap — a standard KDF-in-counter-mode construction,
  safe for any number of DEKs under one master (each wrap uses an
  independent pseudorandom keystream; stdlib-only, no AES dependency).

All functions are executor-safe (no driver state; resolved per call).
"""

from __future__ import annotations

import base64

_MASTER_PREFIX = "dlk"


def _kms_factory(keymap: dict[str, bytes]):
    import pyarrow.parquet.encryption as pe

    import hmac as _hmac
    import os as _os

    def _stream(master: bytes, salt: bytes, n: int) -> bytes:
        return _hmac.new(master, salt, "sha256").digest()[:n]

    class _HmacWrapKms(pe.KmsClient):
        def __init__(self):
            pe.KmsClient.__init__(self)

        def wrap_key(self, key_bytes: bytes, master_key_identifier: str):
            m = keymap[master_key_identifier]
            salt = _os.urandom(16)
            ks = _stream(m, salt, len(key_bytes))
            return base64.b64encode(
                salt + bytes(a ^ b for a, b in zip(key_bytes, ks))
            ).decode()

        def unwrap_key(self, wrapped_key, master_key_identifier: str):
            m = keymap[master_key_identifier]
            w = base64.b64decode(wrapped_key)
            salt, body = w[:16], w[16:]
            ks = _stream(m, salt, len(body))
            return bytes(a ^ b for a, b in zip(body, ks))

    return pe.CryptoFactory(lambda _conf: _HmacWrapKms())


def encrypt_properties(key_id: str, b64key: str,
                       columns: tuple[str, ...] = ("file_path", "pos")):
    """FileEncryptionProperties for one delete file keyed ``key_id``."""
    import pyarrow.parquet.encryption as pe

    factory = _kms_factory({key_id: base64.b64decode(b64key)})
    _FACTORY_LRU[frozenset(((key_id, b64key),))] = factory  # outlive the write
    while len(_FACTORY_LRU) > _FACTORY_LRU_MAX:
        _FACTORY_LRU.pop(next(iter(_FACTORY_LRU)))
    return factory.file_encryption_properties(
        pe.KmsConnectionConfig(),
        pe.EncryptionConfiguration(
            footer_key=key_id,
            # every column under the same catalog key (uniform, like
            # the reference's one-key-per-file model)
            column_keys={key_id: list(columns)},
            double_wrapping=False,
            internal_key_material=True,
            data_key_length_bits=128,
        ),
    )


# The CryptoFactory must outlive every read that uses properties it
# produced (its Python KmsClient resolves keys during decryption;
# letting it be garbage-collected mid-read fails GCM finalization).
# Pin recent factories in a bounded LRU.
_FACTORY_LRU: "dict[frozenset, object]" = {}
_FACTORY_LRU_MAX = 256


def decrypt_properties(keymap_b64: dict[str, str]):
    """FileDecryptionProperties resolving any key id in ``keymap_b64``
    (id -> base64 key, straight from the catalog rows)."""
    import pyarrow.parquet.encryption as pe

    cache_key = frozenset(keymap_b64.items())
    factory = _FACTORY_LRU.pop(cache_key, None)
    if factory is None:
        factory = _kms_factory(
            {kid: base64.b64decode(v) for kid, v in keymap_b64.items()}
        )
    _FACTORY_LRU[cache_key] = factory  # re-insert = move to MRU end
    while len(_FACTORY_LRU) > _FACTORY_LRU_MAX:
        _FACTORY_LRU.pop(next(iter(_FACTORY_LRU)))
    return factory.file_decryption_properties(pe.KmsConnectionConfig())


def key_id_for(b64key: str) -> str:
    """Stable id for a catalog key (sha256 prefix, like the Java side)."""
    import hashlib

    return _MASTER_PREFIX + hashlib.sha256(b64key.encode()).hexdigest()[:16]
