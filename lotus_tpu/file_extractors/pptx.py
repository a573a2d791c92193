"""PPTX reader with optional image captioning.

Counterpart of the reference's PptxReader (``lotus/file_extractors/pptx.py:12-152``):
extracts slide text (and table contents); when ``caption_images=True`` and a
captioning model is available, image shapes are captioned inline.
"""

from __future__ import annotations

from typing import Any

import lotus_tpu


class PptxReader:
    """Extract text per slide from a .pptx file.

    Args:
        caption_images: attempt BLIP captioning of picture shapes (requires
            transformers + torch weights; degrades gracefully when absent).
    """

    def __init__(self, caption_images: bool = False):
        self.caption_images = caption_images
        self._captioner = None
        if caption_images:
            try:
                from transformers import pipeline

                self._captioner = pipeline("image-to-text", model="Salesforce/blip-image-captioning-base")
            except Exception as e:  # pragma: no cover - heavy optional path
                lotus_tpu.logger.warning(f"PptxReader: captioning unavailable ({e}); continuing without.")

    def _caption(self, image_bytes: bytes) -> str | None:
        if self._captioner is None:
            return None
        try:  # pragma: no cover - heavy optional path
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
            result = self._captioner(img)
            if result and isinstance(result, list):
                return str(result[0].get("generated_text", "")).strip() or None
        except Exception as e:
            lotus_tpu.logger.warning(f"PptxReader: captioning failed: {e}")
        return None

    def read(self, path: str) -> list[tuple[str, dict[str, Any]]]:
        """Return [(slide_text, {"page_label": n}), ...]."""
        try:
            from pptx import Presentation  # type: ignore
        except ImportError:
            raise ImportError("The 'python-pptx' library is required to read .pptx files.")

        prs = Presentation(path)
        slides: list[tuple[str, dict[str, Any]]] = []
        for i, slide in enumerate(prs.slides):
            parts: list[str] = []
            for shape in slide.shapes:
                if getattr(shape, "has_text_frame", False):
                    text = "\n".join(p.text for p in shape.text_frame.paragraphs if p.text)
                    if text:
                        parts.append(text)
                if getattr(shape, "has_table", False):
                    rows = [
                        "\t".join(cell.text for cell in row.cells) for row in shape.table.rows
                    ]
                    parts.append("\n".join(rows))
                if shape.shape_type == 13 and self.caption_images:  # PICTURE
                    caption = self._caption(shape.image.blob)
                    if caption:
                        parts.append(f"[Image: {caption}]")
            slides.append(("\n".join(parts), {"page_label": str(i + 1)}))
        return slides or [("", {})]
