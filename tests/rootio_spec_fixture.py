"""Independent ROOT-format fixture builder + spec walker (test-only).

Purpose (VERDICT r2 #1): every .root file the repo had ever read was
written by ``atlasvae.etl.rootio``'s own writer, so a systematic
misreading of the format would round-trip cleanly.  This module breaks
that loop from both directions WITHOUT importing rootio:

* :func:`build_bigfile_fixture` hand-assembles a complete ROOT file
  byte-by-byte from the public format description — in the **large-file
  layout** (fVersion > 1000000, 64-bit seeks, TKey v1004, TDirectory
  v1005) that rootio's writer cannot produce, so none of the writer's
  byte patterns can leak in.  rootio's reader must decode it.
* :func:`walk_records` / :func:`extract_flat_branch` independently
  validate a rootio-WRITTEN file against the container spec (record
  tiling, key self-references, directory pointers, compression frame
  accounting) and re-extract branch data straight from TBasket records,
  using only TKey/basket-trailer/compression-frame knowledge — never
  rootio's Tree machinery.

Everything is re-derived from the public ROOT I/O format documentation
(the TFile/TKey layout in ROOT's io docs and the serialization layout
documented by the uproot project).  The reference contains no ROOT
format code (it delegates to uproot, ref tools/root_utils.py:16-52).
"""

import struct
import zlib

import numpy as np

MAGIC = b"root"
BYTECOUNT = 0x40000000          # kByteCountMask on framed blobs
NEWCLASS = 0xFFFFFFFF           # kNewClassTag on first-seen classes
MAPOFF = 2                      # kMapOffset for object back-references
BIG_VERSION = 1062600           # fVersion > 1000000 => 64-bit layout
BEGIN = 100
DATIME = ((2026 - 1995) << 26) | (2 << 22) | (2 << 17)


def ts(s):
    """TString: u8 length (255 + u32 for long strings) + bytes."""
    b = s.encode()
    if len(b) < 255:
        return bytes([len(b)]) + b
    return bytes([255]) + struct.pack(">I", len(b)) + b


def framed(body):
    """Byte-count frame: u32(len | kByteCountMask) + body."""
    return struct.pack(">I", len(body) | BYTECOUNT) + body


def vframed(version, body):
    """Versioned frame: bytecount + i16 class version + members."""
    return framed(struct.pack(">h", version) + body)


def tobject():
    """TObject members: fVersion=1, fUniqueID, fBits(kIsOnHeap|kNotDeleted)."""
    return struct.pack(">hII", 1, 0, 0x03000000)


def tnamed(name, title):
    return vframed(1, tobject() + ts(name) + ts(title))


def attline():
    """TAttLine v2: color, style, width."""
    return vframed(2, struct.pack(">hhh", 602, 1, 1))


def attfill():
    """TAttFill v2: color, style."""
    return vframed(2, struct.pack(">hh", 0, 1001))


def attmarker():
    """TAttMarker v2: color, style, size."""
    return vframed(2, struct.pack(">hhf", 1, 1, 1.0))


def iofeatures():
    """TIOFeatures v1: 4 reserved bytes + fIOBits."""
    return vframed(1, b"\x00\x00\x00\x00\x00")


def objarray(members, size=None):
    """TObjArray v3: TObject + fName + fSize + fLowerBound + elements."""
    body = (tobject() + ts("") + struct.pack(">ii",
                                             len(members) if size is None
                                             else size, 0)
            + b"".join(members))
    return vframed(3, body)


def new_object(classname, body):
    """First occurrence of a class: bytecount + kNewClassTag + name + blob."""
    inner = struct.pack(">I", NEWCLASS) + classname.encode() + b"\x00" + body
    return struct.pack(">I", len(inner) | BYTECOUNT) + inner


class BigKey:
    """A large-file TKey (v1004: 64-bit fSeekKey/fSeekPdir)."""

    FIXED = 18 + 16   # nbytes,ver,objlen,datime,keylen,cycle + 2 x i64 seeks

    def __init__(self, classname, name, title, trailer=b""):
        self.classname, self.name, self.title = classname, name, title
        self.trailer = trailer
        self.keylen = (self.FIXED + len(ts(classname)) + len(ts(name))
                       + len(ts(title)) + len(trailer))

    def render(self, seek, objlen, body_len, seekpdir=BEGIN, cycle=1):
        return (struct.pack(">ihIIhh", self.keylen + body_len, 1004, objlen,
                            DATIME, self.keylen, cycle)
                + struct.pack(">qq", seek, seekpdir)
                + ts(self.classname) + ts(self.name) + ts(self.title)
                + self.trailer)


def compress_frames(payload, codec):
    """ROOT compression frames, written independently of rootcodec."""
    if codec is None:
        return payload
    if codec == "zlib":
        c = zlib.compress(payload, 6)
        return (b"ZL\x08" + len(c).to_bytes(3, "little")
                + len(payload).to_bytes(3, "little") + c)
    if codec == "lz4":
        import xxhash
        # literals-only LZ4 block: token 0xF0 + length continuation
        n = len(payload)
        if n < 15:
            block = bytes([n << 4]) + payload
        else:
            ext = []
            rest = n - 15
            while rest >= 255:
                ext.append(255)
                rest -= 255
            ext.append(rest)
            block = bytes([0xF0] + ext) + payload
        c = struct.pack(">Q", xxhash.xxh64(block).intdigest()) + block
        return (b"L4\x01" + len(c).to_bytes(3, "little")
                + len(payload).to_bytes(3, "little") + c)
    if codec == "zstd":
        import zstandard
        c = zstandard.ZstdCompressor(level=3).compress(payload)
        return (b"ZS\x01" + len(c).to_bytes(3, "little")
                + len(payload).to_bytes(3, "little") + c)
    if codec == "xz":
        import lzma
        c = lzma.compress(payload, format=lzma.FORMAT_XZ, preset=6)
        return (b"XZ\x00" + len(c).to_bytes(3, "little")
                + len(payload).to_bytes(3, "little") + c)
    raise ValueError(codec)


# --------------------------------------------------------------- builder
def fixture_arrays(n=150, seed=20260817):
    """Deterministic content for the golden fixture."""
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 6, n).astype(np.int32)
    return {
        "pt": (rng.uniform(20.0, 2000.0, n)).astype(np.float32),
        "event": np.arange(10_000, 10_000 + n, dtype=np.int64),
        "n_trk": counts,
        "trk_pt": [rng.uniform(0.5, 50.0, c).astype(np.float32)
                   for c in counts],
        "cl": [[rng.uniform(0.0, 1.0, int(m)).astype(np.float32)
                for m in rng.integers(0, 4, int(j))]
               for j in rng.integers(0, 3, n)],
    }


def build_bigfile_fixture(path, codec="zlib", n=150, basket_entries=64,
                          treename="nominal", memberwise=False):
    """Hand-assemble a large-file-format ROOT file at ``path``.

    Contents: one TTree ``nominal`` with a flat float32 branch ``pt``,
    a flat int64 branch ``event``, a counter-jagged pair
    ``n_trk``/``trk_pt[n_trk]/F``, and a ``vector<vector<float>>``
    TBranchElement ``cl``.  Returns the expected arrays dict.

    ``memberwise=True`` streams the STL entries member-wise — the
    version word carries kStreamedMemberWise (0x4000) followed by the
    contained class's 2-byte version, as ROOT's collection proxy writes
    them (uproot reads both streamings of real ATLAS files, ref
    tools/root_utils.py:16-28); for nested vectors of a POD the element
    payload layout is otherwise identical to object-wise.
    """
    data = fixture_arrays(n)
    image = bytearray(b"\x00" * BEGIN)
    fname = path.split("/")[-1]

    records = []        # (BigKey, seek, objlen, body_len) for the keys list

    def add_record(key, payload, compress=True, keep=False):
        seek = len(image)
        body = payload
        if compress and codec and len(payload) > 128:
            c = compress_frames(payload, codec)
            if len(c) < len(payload):
                body = c
        image.extend(key.render(seek, len(payload), len(body)))
        image.extend(body)
        if keep:
            records.append((key, seek, len(payload), len(body)))
        return seek, key.keylen + len(body)

    # ---- first record: TFile strings + TDirectoryFile (v1005, 64-bit)
    first_key = BigKey("TFile", fname, "")
    nbytesname = first_key.keylen + len(ts(fname)) + len(ts(""))
    # reserve its space now (strings + dver/datimes/sizes/seeks + TUUID)
    # so the basket records land after it, not under it
    first_record_len = nbytesname + 2 + 8 + 8 + 24 + 2 + 16
    image.extend(b"\x00" * first_record_len)

    # ---- baskets --------------------------------------------------------
    basket_meta = {}    # branch -> list of (seek, nbytes, entry0, nev)

    def add_basket(bname, data_bytes, nev, entry0, nevbufsize,
                   rel_offsets=None):
        """One TBasket record.  ``rel_offsets``: per-entry start of the
        entry's bytes within the data region (jagged/STL baskets)."""
        key = BigKey("TBasket", bname, treename, trailer=b"\x00" * 19)
        border = len(data_bytes)
        payload = data_bytes
        if rel_offsets is not None:
            absolute = np.asarray(np.asarray(rel_offsets, np.int64)
                                  + key.keylen, ">i4")
            payload = (payload + struct.pack(">i", nev)
                       + absolute.tobytes())
        # basket trailer lives at the tail of the key header:
        # fVersion, fBufferSize, fNevBufSize, fNevBuf, fLast, flag
        trailer = struct.pack(">hiiiiB", 1004, len(payload) + key.keylen,
                              nevbufsize, nev, key.keylen + border, 0)
        key.trailer = trailer
        seek, nbytes = add_record(key, payload)
        basket_meta.setdefault(bname, []).append((seek, nbytes, entry0, nev))

    flat = {"pt": data["pt"].astype(">f4"),
            "event": data["event"].astype(">i8"),
            "n_trk": data["n_trk"].astype(">i4")}
    for bname, arr in flat.items():
        for e0 in range(0, n, basket_entries):
            part = arr[e0:e0 + basket_entries]
            add_basket(bname, part.tobytes(), len(part), e0,
                       arr.dtype.itemsize)

    trk_sizes = np.array([len(v) for v in data["trk_pt"]], np.int64)
    trk_starts = np.concatenate([[0], np.cumsum(trk_sizes)])
    trk_flat = (np.concatenate(data["trk_pt"]).astype(">f4")
                if trk_sizes.sum() else np.zeros(0, ">f4"))
    for e0 in range(0, n, basket_entries):
        nev = min(basket_entries, n - e0)
        lo, hi = trk_starts[e0], trk_starts[e0 + nev]
        add_basket("trk_pt", trk_flat[lo:hi].tobytes(), nev, e0, 0,
                   rel_offsets=(trk_starts[e0:e0 + nev] - lo) * 4)

    # STL vector<vector<float>> entries.  Object-wise streaming: each
    # entry = bytecount frame + i16 version(6) + i32 outer count + per
    # inner vector a bare i32 count + payload.  Member-wise streaming:
    # the version word additionally carries kStreamedMemberWise (0x4000)
    # and is followed by the contained class's i16 version before the
    # outer count.
    for e0 in range(0, n, basket_entries):
        nev = min(basket_entries, n - e0)
        blob, offs = b"", []
        for entry in data["cl"][e0:e0 + nev]:
            offs.append(len(blob))
            if memberwise:
                body = struct.pack(">hhi", 6 | 0x4000, 6, len(entry))
            else:
                body = struct.pack(">hi", 6, len(entry))
            for v in entry:
                body += struct.pack(">i", len(v)) + v.astype(">f4").tobytes()
            blob += framed(body)
        add_basket("cl", blob, nev, e0, 0, rel_offsets=offs)

    # ---- the TTree record ----------------------------------------------
    tree_key = BigKey("TTree", treename, treename)

    def leaf_blob(cls, name, title, lentype, is_range=False,
                  count_ref=0, maximum=0):
        base = (tnamed(name, title)
                + struct.pack(">iii", 1, lentype, 0)          # len,lentype,off
                + struct.pack(">BB", int(is_range), 0)        # range,unsigned
                + struct.pack(">I", count_ref))               # fLeafCount
        base = vframed(2, base)
        if cls == "TLeafF":
            tail = struct.pack(">ff", 0, maximum)
        elif cls == "TLeafL":
            tail = struct.pack(">qq", 0, maximum)
        else:                                                 # TLeafI
            tail = struct.pack(">ii", 0, int(maximum))
        return vframed(1, base + tail)

    def leaf_element_blob(name, title):
        base = (tnamed(name, title) + struct.pack(">iiiBB", 1, 0, 0, 0, 0)
                + struct.pack(">I", 0))
        return vframed(1, vframed(2, base) + struct.pack(">ii", -1, 0))

    leaf_ref = {}       # branch -> map id of its serialized leaf

    def branch_members(bname, leaf_cls, leaf_title, lentype, pos_in_payload,
                       obj_head, entry_offset_len, is_range=False,
                       count_ref=0, maximum=0, element=False):
        """Serialized members of TBranch v13 (without the version frame).

        ``pos_in_payload`` is the byte position of the branch object's
        outer bytecount word within the TTree payload; the leaf map id
        is derived from it the way ROOT's buffer map does
        (key length + buffer position + kMapOffset).
        """
        bk = basket_meta[bname]
        nb = len(bk)
        maxb = nb + 1
        m = tnamed(bname, leaf_title if not element else bname)
        m += attfill()
        m += struct.pack(">iiii", 1, 32000, entry_offset_len, nb)
        m += struct.pack(">q", sum(b[3] for b in bk))          # fEntryNumber
        m += iofeatures()
        m += struct.pack(">iii", 0, maxb, 0)     # fOffset,fMaxBaskets,fSplit
        tot = sum(b[1] for b in bk)
        m += struct.pack(">qqqq", n, 0, tot, tot)
        m += objarray([])                                      # fBranches
        # fLeaves: the map id points at the bytecount word of the leaf
        # object (new_object frame) inside the full record buffer
        arr_head = (struct.pack(">h", 3) + tobject() + ts("")
                    + struct.pack(">ii", 1, 0))
        leaf_pos = (pos_in_payload + obj_head + len(m) + 4 + len(arr_head))
        leaf_ref[bname] = tree_key.keylen + leaf_pos + MAPOFF
        if element:
            leaf = new_object("TLeafElement",
                              leaf_element_blob(bname, leaf_title))
        else:
            leaf = new_object(leaf_cls,
                              leaf_blob(leaf_cls, bname, leaf_title, lentype,
                                        is_range, count_ref, maximum))
        m += framed(arr_head + leaf)
        m += objarray([])                                      # fBaskets
        m += b"\x01" + np.array([b[1] for b in bk] + [0] * (maxb - nb),
                                ">i4").tobytes()
        entry_arr = [b[2] for b in bk] + [n] + [0] * (maxb - nb - 1)
        m += b"\x01" + np.array(entry_arr, ">i8").tobytes()
        m += b"\x01" + np.array([b[0] for b in bk] + [0] * (maxb - nb),
                                ">i8").tobytes()
        m += ts("")                                            # fFileName
        return m

    payload = bytearray()
    payload += tnamed(treename, treename)
    payload += attline() + attfill() + attmarker()
    payload += struct.pack(">q", n)                            # fEntries
    payload += struct.pack(">qqqq", 0, 0, 0, 0)                # Tot/Zip/...
    payload += struct.pack(">d", 1.0)                          # fWeight
    payload += struct.pack(">iiiii", 0, 25, 0, 1000, 0)
    payload += struct.pack(">qqqqqq", 10**9, 10**9, 0, -3 * 10**8, 0, 10**6)
    payload += b"\x01\x01"                                     # cluster arrays
    payload += iofeatures()

    order = ["pt", "event", "n_trk", "trk_pt", "cl"]
    arr_head = (struct.pack(">h", 3) + tobject() + ts("")
                + struct.pack(">ii", len(order), 0))
    # byte position, within the payload, where branch objects begin:
    # TTree bytecount(4)+version(2) are OUTSIDE payload (added at the
    # end), so account for them via the record frame below
    frame_head = 4 + 2          # the TTree record's own bytecount+version
    branches_start = frame_head + len(payload) + 4 + len(arr_head)

    blobs = []
    pos = branches_start
    # plain TBranch object head: bc + tag + "TBranch\0" + bc + i16
    tb_head = 4 + 4 + len(b"TBranch\x00") + 4 + 2
    for bname, cls, title, lentype, rng_, extra in [
            ("pt", "TLeafF", "pt/F", 4, False, {}),
            ("event", "TLeafL", "event/L", 8, False, {}),
            ("n_trk", "TLeafI", "n_trk/I", 4, True,
             {"maximum": int(data["n_trk"].max())}),
            ("trk_pt", "TLeafF", "trk_pt[n_trk]/F", 4, False, {}),
    ]:
        count_ref = leaf_ref["n_trk"] if bname == "trk_pt" else 0
        eol = 1000 if bname == "trk_pt" else 0
        members = branch_members(bname, cls, title, lentype, pos, tb_head,
                                 eol, is_range=rng_, count_ref=count_ref,
                                 **extra)
        blob = new_object("TBranch", vframed(13, members))
        blobs.append(blob)
        pos += len(blob)

    # TBranchElement v10 for the STL branch
    tbe_head = 4 + 4 + len(b"TBranchElement\x00") + 4 + 2 + 4 + 2
    members = branch_members("cl", None, "cl", 0, pos, tbe_head, 1000,
                             element=True)
    extra = (ts("vector<vector<float> >") + ts("") + ts("")
             + struct.pack(">Ih", 0, 6)
             + struct.pack(">iiii", -1, 0, -1, 0)
             + struct.pack(">II", 0, 0))
    blobs.append(new_object("TBranchElement",
                            vframed(10, vframed(13, members) + extra)))

    payload += framed(arr_head + b"".join(blobs))
    # fLeaves TObjArray: back-references to each branch's leaf
    refs = b"".join(struct.pack(">I", leaf_ref[b]) for b in order)
    payload += framed(struct.pack(">h", 3) + tobject() + ts("")
                      + struct.pack(">ii", len(order), 0) + refs)
    payload += struct.pack(">I", 0)               # fAliases
    payload += struct.pack(">i", 0)               # fIndexValues
    payload += struct.pack(">i", 0)               # fIndex
    payload += struct.pack(">I", 0)               # fTreeIndex
    payload += struct.pack(">I", 0)               # fFriends
    tree_payload = vframed(20, bytes(payload))
    add_record(tree_key, tree_payload, keep=True)

    # ---- StreamerInfo record (empty TList) ------------------------------
    si_key = BigKey("TList", "StreamerInfo", "Doubly linked list")
    si_payload = vframed(5, tobject() + ts("") + struct.pack(">i", 0))
    seekinfo, nbytesinfo = add_record(si_key, si_payload, compress=False)

    # ---- keys list ------------------------------------------------------
    keys_payload = struct.pack(">i", len(records)) + b"".join(
        key.render(seek, objlen, body_len)
        for key, seek, objlen, body_len in records)
    keys_key = BigKey("TFile", fname, "")
    seekkeys, nbyteskeys = add_record(keys_key, keys_payload, compress=False)

    # ---- first record at BEGIN ------------------------------------------
    dir_body = (ts(fname) + ts("")
                + struct.pack(">h", 1005) + struct.pack(">II", DATIME, DATIME)
                + struct.pack(">ii", nbyteskeys, nbytesname)
                + struct.pack(">qqq", BEGIN, 0, seekkeys)
                + struct.pack(">h", 1) + b"\x00" * 16)          # TUUID
    first = first_key.render(BEGIN, len(dir_body), len(dir_body),
                             seekpdir=0)
    image[BEGIN:BEGIN + len(first) + len(dir_body)] = first + dir_body

    # ---- file header ----------------------------------------------------
    end = len(image)
    header = (MAGIC
              + struct.pack(">i", BIG_VERSION)
              + struct.pack(">i", BEGIN)
              + struct.pack(">q", end)              # fEND (i64)
              + struct.pack(">q", 0)                # fSeekFree
              + struct.pack(">i", 0)                # fNbytesFree
              + struct.pack(">i", 0)                # nfree
              + struct.pack(">i", nbytesname)
              + struct.pack(">B", 8)                # fUnits: 64-bit seeks
              + struct.pack(">i", 101)              # fCompress
              + struct.pack(">q", seekinfo)
              + struct.pack(">i", nbytesinfo)
              + struct.pack(">h", 1) + b"\x00" * 16)
    image[:len(header)] = header
    with open(path, "wb") as f:
        f.write(image)
    return data


# ----------------------------------------------------------- spec walker
def _parse_any_key(buf, pos):
    """Parse a TKey at ``pos`` (either seek width), spec-only."""
    nbytes, version, objlen, _datime, keylen, cycle = struct.unpack_from(
        ">ihIIhh", buf, pos)
    p = pos + 18
    if version > 1000:
        seek, seekpdir = struct.unpack_from(">qq", buf, p)
        p += 16
    else:
        seek, seekpdir = struct.unpack_from(">ii", buf, p)
        p += 8
    out = {"nbytes": nbytes, "objlen": objlen, "keylen": keylen,
           "cycle": cycle, "seek": seek, "seekpdir": seekpdir, "pos": pos}
    for field in ("classname", "name", "title"):
        ln = buf[p]
        p += 1
        if ln == 255:
            ln = struct.unpack_from(">I", buf, p)[0]
            p += 4
        out[field] = buf[p:p + ln].decode()
        p += ln
    out["trailer_pos"] = p
    return out


def _decompress_frames(body, objlen):
    """Spec-only frame decoder (zlib/lz4/zstd), with accounting checks."""
    if len(body) == objlen:
        return body
    out, pos = b"", 0
    while pos < len(body):
        algo = body[pos:pos + 2]
        csize = int.from_bytes(body[pos + 3:pos + 6], "little")
        usize = int.from_bytes(body[pos + 6:pos + 9], "little")
        chunk = body[pos + 9:pos + 9 + csize]
        assert len(chunk) == csize, "frame promises more bytes than present"
        if algo == b"ZL":
            dec = zlib.decompress(chunk)
        elif algo == b"L4":
            import xxhash
            assert struct.unpack(">Q", chunk[:8])[0] == \
                xxhash.xxh64(chunk[8:]).intdigest(), "L4 checksum mismatch"
            dec = _lz4_block_decode(chunk[8:], usize)
        elif algo == b"ZS":
            import zstandard
            dec = zstandard.ZstdDecompressor().decompress(
                chunk, max_output_size=usize)
        else:
            raise AssertionError(f"unexpected frame tag {algo!r}")
        assert len(dec) == usize, "frame usize mismatch"
        out += dec
        pos += 9 + csize
    assert len(out) == objlen, "frames do not sum to objlen"
    return out


def _lz4_block_decode(src, usize):
    """Minimal spec-only LZ4 block decoder (for walker independence)."""
    dst = bytearray()
    i, nsrc = 0, len(src)
    while i < nsrc:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        dst += src[i:i + lit]
        i += lit
        if i >= nsrc:
            break
        off = src[i] | (src[i + 1] << 8)
        i += 2
        mlen = token & 15
        if mlen == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(dst) - off
        for k in range(mlen):
            dst.append(dst[start + k])
    assert len(dst) == usize
    return bytes(dst)


def walk_records(path):
    """Validate the container of any small-format ROOT file against the
    spec and return its records.  Checks: magic/header consistency,
    contiguous record tiling from fBEGIN to fEND, key self-references,
    directory -> keys-list linkage, per-record compression accounting.
    """
    buf = open(path, "rb").read()
    assert buf[:4] == MAGIC, "bad magic"
    version, begin = struct.unpack_from(">ii", buf, 4)
    assert version < 1000000, "walker covers the small format"
    end, seekfree, nbytesfree, _nfree, nbytesname = struct.unpack_from(
        ">iiiii", buf, 12)
    assert end == len(buf), "fEND != file size"
    seekinfo = struct.unpack_from(">i", buf, 37)[0]

    records, pos = [], begin
    while pos < end:
        k = _parse_any_key(buf, pos)
        assert k["nbytes"] > 0, f"non-positive record size at {pos}"
        assert k["seek"] == pos, (
            f"key at {pos} claims fSeekKey={k['seek']}")
        body = buf[pos + k["keylen"]:pos + k["nbytes"]]
        payload = _decompress_frames(body, k["objlen"])
        k["payload"] = payload
        records.append(k)
        pos += k["nbytes"]
    assert pos == end, "records do not tile the file exactly"

    # first record: the TFile directory
    first = records[0]
    assert first["classname"] == "TFile" and first["seekpdir"] == 0
    # directory members follow the name/title strings
    p = begin + nbytesname
    dver = struct.unpack_from(">h", buf, p)[0]
    p += 2 + 8
    if dver > 1000:
        _nk, _nn, _sd, _sp, seekkeys = struct.unpack_from(">iiqqq", buf, p)
    else:
        _nk, _nn, _sd, _sp, seekkeys = struct.unpack_from(">iiiii", buf, p)
    keylist = next(r for r in records if r["seek"] == seekkeys)
    nkeys = struct.unpack_from(">i", keylist["payload"], 0)[0]
    listed, p2 = [], 4
    for _ in range(nkeys):
        lk = _parse_any_key(keylist["payload"], p2)
        # every listed key must reference a real record of the same class
        target = next(r for r in records if r["seek"] == lk["seek"])
        assert target["classname"] == lk["classname"]
        assert target["name"] == lk["name"]
        listed.append(lk)
        pos = lk["trailer_pos"]
        p2 = pos
    assert any(r["seek"] == seekinfo for r in records), \
        "fSeekInfo points at no record"
    return records, listed


def extract_flat_branch(path, branch, dtype):
    """Re-extract a flat branch's values straight from its TBasket
    records — no TTree metadata, rootio reader not involved."""
    records, _ = walk_records(path)
    parts = []
    for r in records:
        if r["classname"] == "TBasket" and r["name"] == branch:
            # basket trailer: fVersion,fBufferSize,fNevBufSize,fNevBuf,
            # fLast at the tail of the key header
            _, _, _, nev, flast, _ = struct.unpack_from(
                ">hiiiiB", open(path, "rb").read(), r["trailer_pos"])
            border = flast - r["keylen"]
            parts.append((r["seek"],
                          np.frombuffer(r["payload"][:border], dtype)))
    parts.sort(key=lambda t: t[0])
    return np.concatenate([p for _, p in parts]) if parts else \
        np.zeros(0, dtype)


def extract_jagged_branch(path, branch, dtype):
    """Re-extract a jagged branch via basket entry offsets, spec-only."""
    raw = open(path, "rb").read()
    records, _ = walk_records(path)
    out = []
    isz = np.dtype(dtype).itemsize
    baskets = sorted(
        (r for r in records
         if r["classname"] == "TBasket" and r["name"] == branch),
        key=lambda r: r["seek"])
    for r in baskets:
        _, _, _, nev, flast, _ = struct.unpack_from(">hiiiiB", raw,
                                                    r["trailer_pos"])
        border = flast - r["keylen"]
        payload = r["payload"]
        offs = np.frombuffer(payload, ">i4", nev, border + 4) - r["keylen"]
        ends = np.append(offs[1:], border)
        for lo, hi in zip(offs, ends):
            out.append(np.frombuffer(payload[lo:hi], dtype))
    return out
