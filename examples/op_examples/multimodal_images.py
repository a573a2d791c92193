"""Semantic operators over images via the ImageArray extension dtype.

Mirrors the reference's multimodal_ops examples (reference
examples/op_examples/multimodal_ops/{map,filter}.py): put images in a
DataFrame column with ``ImageArray`` and every ``{image}`` placeholder
serializes them into the multimodal LM payload.  Paths, URLs, ndarrays and
PIL images all load lazily with per-row caching.

Offline the fake transport answers deterministically; set LOTUS_TPU_MODEL
to a vision-capable model for a real run.
"""

import sys
import tempfile

from pathlib import Path

import numpy as np
import pandas as pd
from PIL import Image, ImageDraw

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from examples._common import configure
from lotus_tpu.dtype_extensions import ImageArray

# Render tiny digit images on the fly (stand-ins for the reference's MNIST
# crops, which we do not vendor).
tmp = tempfile.mkdtemp()
paths, labels = [], []
for digit in (0, 1, 2, 3):
    img = Image.new("L", (28, 28), 0)
    ImageDraw.Draw(img).text((8, 6), str(digit), fill=255)
    p = f"{tmp}/{digit}.png"
    img.save(p)
    paths.append(p)
    labels.append(digit)

configure(lambda prompt, messages, **kw: "a handwritten digit on a dark background")

df = pd.DataFrame({"image": ImageArray(paths), "label": labels})
print(df.dtypes.to_dict())

# sem_map over the image column: each row's image rides the LM payload.
described = df.sem_map("Describe what {image} shows in five words.")
print(described[["label", "_map"]])

# ndarray-backed images work identically (e.g. arrays straight off a model).
# Offline, the scripted judge "recognizes" one image per call round-robin.
verdicts = iter(["Answer: False", "Answer: True", "Answer: False", "Answer: False"])
configure(lambda prompt, messages, **kw: next(verdicts))
arrays = [np.asarray(Image.open(p)) for p in paths]
df2 = pd.DataFrame({"image": ImageArray(arrays), "label": labels})
filtered = df2.sem_filter("{image} shows the digit 1")
print("kept labels:", filtered["label"].tolist())
