"""Where does -9's ratio come from? Parse reference -9 streams and
attribute saved bytes to (distance, length) bands. Decides the device
matcher's window architecture."""
import subprocess, sys, pathlib, numpy as np
sys.path.insert(0, "/root/repo")
from bench import make_corpus

def sequences(frame: bytes):
    # modern frame only: skip 7-byte header, walk blocks
    pos = 7
    seqs = []
    while pos + 4 <= len(frame):
        size = int.from_bytes(frame[pos:pos+4], "little"); pos += 4
        if size == 0: break
        stored = bool(size & 0x80000000); size &= 0x7FFFFFFF
        blk = frame[pos:pos+size]; pos += size
        if stored: continue
        i = 0
        while i < len(blk):
            tok = blk[i]; i += 1
            nlit = tok >> 4
            if nlit == 15:
                while True:
                    b = blk[i]; i += 1; nlit += b
                    if b != 255: break
            i += nlit
            if i >= len(blk): break  # last token literals only
            dist = blk[i] | (blk[i+1] << 8); i += 2
            mlen = (tok & 15) + 4
            if (tok & 15) == 15:
                while True:
                    b = blk[i]; i += 1; mlen += b
                    if b != 255: break
            seqs.append((dist, mlen))
    return seqs

def profile(name, data):
    out = subprocess.run(["/tmp/refbin/smallz4", "-9"], input=data, capture_output=True).stdout
    seqs = sequences(out)
    d = np.array([s[0] for s in seqs]); l = np.array([s[1] for s in seqs])
    # cost model: a match of length L costs ~3 bytes (token share+offset) vs L literals
    saved = l - 3 - (l >= 19) * (1 + (l - 19) // 255)
    tot = saved.sum()
    print(f"== {name}: {len(data)} -> {len(out)} ({100*len(out)/len(data):.2f}%), {len(seqs)} seqs, saved~{tot}")
    for lo, hi in [(1,64),(64,1024),(1024,4096),(4096,8192),(8192,16384),(16384,32768),(32768,65536)]:
        m = (d >= lo) & (d < hi)
        print(f"  d in [{lo:>6},{hi:>6}): {m.sum():>7} seqs  saved={saved[m].sum():>8} ({100*saved[m].sum()/tot:5.1f}%)")
    for lo, hi in [(4,8),(8,16),(16,32),(32,64),(64,256),(256,1<<30)]:
        m = (l >= lo) & (l < hi)
        print(f"  len in [{lo:>4},{hi:>6}): {m.sum():>7} seqs  saved={saved[m].sum():>8} ({100*saved[m].sum()/tot:5.1f}%)")
    # ratio if far matches (d>=W) were dropped entirely (pessimistic: all become literals)
    for W in (4096, 8192, 16384, 32768):
        m = d >= W
        print(f"  drop d>={W:>6}: size would grow by ~{saved[m].sum()} B -> {100*(len(out)+saved[m].sum())/len(data):.2f}%")

profile("bench-10MB", make_corpus())
inc = subprocess.run(["tar","c","/usr/include"], capture_output=True).stdout[:10_000_000]
profile("usrinclude-10MB", inc)
