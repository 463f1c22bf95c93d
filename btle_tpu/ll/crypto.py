"""LL encryption: AES-CCM session crypto for sniffed connections.

Beyond-reference: the C tool parses LL_ENC_REQ/LL_ENC_RSP fields and
stops — an encrypted connection is opaque to it. Given the LTK (from
pairing, a debugger, or Just-Works sniffing), this module derives the
session key and decrypts/authenticates the data PDUs the wideband
sniffer captures, per Core Spec Vol 6 Part E:

* session key:  SK = AES-128-ECB_E(LTK, SKD),  SKD = SKDm || SKDs
* per-PDU AES-CCM, MIC 4 bytes, 13-byte nonce =
      packetCounter (39 bits, little-endian over 5 bytes, with the
      direction bit — 1 = central->peripheral — as the MSB of byte 4)
      || IV  (IVm || IVs, 8 bytes)
* additional authenticated data = the first header octet with the
  NESN/SN/MD bits masked to zero (header & 0xE3)
* the packet counter increments independently per direction, counting
  ENCRYPTED data PDUs only (empty PDUs are not encrypted and do not
  count)

Byte-order conventions (documented for verification — this environment
has no off-the-air encrypted captures and the reference offers none):
LTK/SKD/IV parameters here are the CONCATENATED big-endian (display
order) values; the LL_ENC_REQ/RSP fields arrive little-endian on air
and `session_from_enc_exchange` performs the reversal, with SKD =
SKDm || SKDs and IV = IVm || IVs in transmission-order concatenation.
Self-consistency is fully tested (loopback both directions, MIC
tamper detection, counter windows); wire interop should be checked
against the Core Spec Vol 6 Part C sample data where available.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
from cryptography.hazmat.primitives.ciphers.aead import AESCCM

MIC_LEN = 4


def aes_e(key: bytes, plaintext: bytes) -> bytes:
    """The spec's security function e: one AES-128-ECB block encrypt."""
    enc = Cipher(algorithms.AES(bytes(key)), modes.ECB()).encryptor()
    return enc.update(bytes(plaintext)) + enc.finalize()


def session_key(ltk: bytes, skd: bytes) -> bytes:
    """SK = e(LTK, SKD); both 16 bytes, display (big-endian) order."""
    if len(ltk) != 16 or len(skd) != 16:
        raise ValueError("LTK and SKD must be 16 bytes")
    return aes_e(ltk, skd)


def _nonce(counter: int, direction: int, iv: bytes) -> bytes:
    if len(iv) != 8:
        raise ValueError("IV must be 8 bytes")
    if counter >= 1 << 39:
        raise ValueError("packet counter exceeds 39 bits")
    ctr = bytearray(counter.to_bytes(5, "little"))
    ctr[4] |= (direction & 1) << 7
    return bytes(ctr) + bytes(iv)


def _aad(header_byte: int) -> bytes:
    # NESN (bit 2), SN (bit 3), MD (bit 4) are masked from the
    # authenticated first octet (they may be retransmission-modified)
    return bytes([header_byte & 0xE3])


@dataclass
class LlSession:
    """One encrypted LL connection's receive-side crypto state.

    Tracks an independent 39-bit packet counter per direction; decrypt
    tries a small counter window so a missed (not captured) PDU does
    not desynchronize the sniffer — the MIC arbitrates.
    """

    sk: bytes
    iv: bytes
    counters: dict = field(default_factory=lambda: {0: 0, 1: 0})
    resync_window: int = 8

    @classmethod
    def from_enc_exchange(cls, ltk: bytes, skd_m: bytes, skd_s: bytes,
                          iv_m: bytes, iv_s: bytes) -> "LlSession":
        """Keys from the sniffed LL_ENC_REQ (SKDm, IVm) + LL_ENC_RSP
        (SKDs, IVs) fields, each given in on-air little-endian byte
        order as parsed; SKD/IV concatenate per the spec and are
        converted to the display-order convention internally."""
        skd = (bytes(skd_m) + bytes(skd_s))[::-1]
        iv = (bytes(iv_m) + bytes(iv_s))[::-1]
        return cls(sk=session_key(ltk, skd), iv=iv)

    @classmethod
    def from_parsed_exchange(cls, ltk: bytes, enc_req_fields: dict,
                             enc_rsp_fields: dict) -> "LlSession":
        """Directly from parse_ll_payload's ctrl.fields (which present
        skdm/ivm/skds/ivs in DISPLAY order): SKDm/IVm are the least-
        significant halves, so display-order SKD = SKDs || SKDm and
        IV = IVs || IVm."""
        skd = bytes(enc_rsp_fields["skds"]) + bytes(enc_req_fields["skdm"])
        iv = bytes(enc_rsp_fields["ivs"]) + bytes(enc_req_fields["ivm"])
        return cls(sk=session_key(bytes(ltk), skd), iv=iv)

    # ---------------- encrypt (TX-side / scene synthesis) -------------
    def encrypt(self, header_byte: int, payload: bytes,
                direction: int) -> bytes:
        """payload -> ciphertext||MIC; advances the direction counter."""
        n = _nonce(self.counters[direction], direction, self.iv)
        out = AESCCM(self.sk, tag_length=MIC_LEN).encrypt(
            n, bytes(payload), _aad(header_byte))
        self.counters[direction] += 1
        return out

    # ---------------- decrypt (sniffer side) --------------------------
    def decrypt(self, header_byte: int, payload_mic: bytes,
                direction: int) -> bytes | None:
        """ciphertext||MIC -> payload, or None if no counter in the
        resync window authenticates. On success the counter jumps past
        the one that worked (tolerates un-captured PDUs)."""
        if len(payload_mic) < MIC_LEN + 1:
            return None
        base = self.counters[direction]
        ccm = AESCCM(self.sk, tag_length=MIC_LEN)
        for delta in range(self.resync_window):
            n = _nonce(base + delta, direction, self.iv)
            try:
                plain = ccm.decrypt(n, bytes(payload_mic),
                                    _aad(header_byte))
            except Exception:
                continue
            self.counters[direction] = base + delta + 1
            return plain
        return None


class SniffDecryptor:
    """Passive per-connection decryption for a sniffer stream.

    Feed every decoded packet (WidebandPacket-shaped: access_addr,
    header/payload attached by the sniffer's parse). The decryptor
    watches each connection's LL_ENC_REQ/LL_ENC_RSP fly by, derives the
    session once both halves are seen, and then opportunistically
    decrypts data PDUs (unknown direction: both are tried — the MIC
    arbitrates; plaintext PDUs simply fail authentication and pass
    through untouched).
    """

    def __init__(self, ltk: bytes):
        self.ltk = bytes(ltk)
        self._enc_req: dict[int, dict] = {}
        self.sessions: dict[int, LlSession] = {}
        self.decrypted = 0

    def observe_ctrl(self, aa: int, opcode: int, fields: dict) -> None:
        """Feed a decoded LL ctrl PDU (keys sessions from ENC_REQ/RSP)."""
        from .pdu import LlCtrlOpcode

        if opcode == int(LlCtrlOpcode.LL_ENC_REQ):
            self._enc_req[aa] = fields
        elif (opcode == int(LlCtrlOpcode.LL_ENC_RSP)
                and aa in self._enc_req):
            self.sessions[aa] = LlSession.from_parsed_exchange(
                self.ltk, self._enc_req[aa], fields)

    def try_decrypt(self, aa: int, header_byte: int,
                    payload_mic: bytes) -> bytes | None:
        """Attempt both directions against aa's session (if keyed)."""
        sess = self.sessions.get(aa)
        if sess is None or len(payload_mic) < MIC_LEN + 1:
            return None
        for direction in (0, 1):
            plain = sess.decrypt(header_byte, payload_mic, direction)
            if plain is not None:
                self.decrypted += 1
                return plain
        return None

    def on_packet(self, pkt) -> bytes | None:
        """Sniffer-packet convenience (WidebandPacket-shaped): returns
        the decrypted payload when authentication succeeds."""
        aa = getattr(pkt, "access_addr", None)
        if aa is None or not getattr(pkt, "crc_ok", False):
            return None
        ctrl = getattr(getattr(pkt, "payload", None), "ctrl", None)
        if ctrl is not None:
            self.observe_ctrl(aa, ctrl.opcode, ctrl.fields)
            return None
        raw = bytes(pkt.pdu_bytes)
        if len(raw) < 2:
            return None
        return self.try_decrypt(aa, raw[0], raw[2:])
