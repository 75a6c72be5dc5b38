#!/usr/bin/env python3
"""Generate the committed media fixtures under fixtures/media/ —
tiny BMP/PPM/WAV files with ANALYTICALLY KNOWN dimensions, duration and
mean intensity, so the x3 oracle and MultimodalSpec can assert the real
pure-JVM decoder (graft.operators.MediaDecode) against planted values.

Deterministic: fixed bytes, no RNG. Run once; outputs are committed.

Planted values (mirrored in Multimodal.x3 oracle + MultimodalSpec):
  gray.bmp    6x4  24bpp, all (128,128,128) -> intensity 128/255
  tint.bmp    4x2  24bpp, all BGR (30,20,10) -> intensity 20/255
  rgb.ppm     3x2  P6, pure R,G,B pixels     -> intensity 85/255
  tone.wav    8000 Hz mono 16-bit, 2000-sample +/-16384 square
              -> 250 ms, level 16384/32768 = 0.5
  stereo.wav  44100 Hz stereo 16-bit, 4410 zero frames
              -> 100 ms, level 0.0
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "media")


def bmp(width, height, bgr):
    row = bytes(bgr) * width
    pad = b"\x00" * ((4 - len(row) % 4) % 4)
    pixels = (row + pad) * height
    data_off = 14 + 40
    size = data_off + len(pixels)
    fh = b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
    ih = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                     len(pixels), 2835, 2835, 0, 0)
    return fh + ih + pixels


def ppm(width, height, pixel_rows):
    body = b"".join(bytes(p) for row in pixel_rows for p in row)
    return b"P6\n# fixture\n%d %d\n255\n" % (width, height) + body


def wav(sample_rate, channels, frames):
    body = b"".join(struct.pack("<h", s) for f in frames for s in f)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def main():
    os.makedirs(OUT, exist_ok=True)
    files = {
        "gray.bmp": bmp(6, 4, (128, 128, 128)),
        "tint.bmp": bmp(4, 2, (30, 20, 10)),
        "rgb.ppm": ppm(3, 2, [[(255, 0, 0), (0, 255, 0), (0, 0, 255)]] * 2),
        "tone.wav": wav(8000, 1, [[16384 if i % 2 == 0 else -16384]
                                  for i in range(2000)]),
        "stereo.wav": wav(44100, 2, [[0, 0]] * 4410),
    }
    for name, data in files.items():
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        print(f"wrote {name}: {len(data)} bytes")


if __name__ == "__main__":
    main()
