"""Batch 46 imaging: letterbox/pillarbox border detection and
flat-image (dominant color) audit over the pure-numpy PNG codec."""

import numpy as np
import pyarrow as pa

from datatest_ray.functions.png import png_encode


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def _img(h, w, border=0, top=0, bottom=0, left=0, right=0, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(60, 200, (h, w, 3)).astype(np.uint8)
    if top:
        img[:top] = border
    if bottom:
        img[h - bottom:] = border
    if left:
        img[:, :left] = border
    if right:
        img[:, w - right:] = border
    return img


def _run(rows):
    from datatest_ray.stages.transforms import audit_image_content

    t = pa.table({
        "image_id": pa.array([r[0] for r in rows]),
        "bytes": pa.array([r[1] for r in rows], pa.binary()),
    })
    out = pa.concat_tables(list(audit_image_content(
        _ds(t), concurrency=1, batch_size=8).iter_batches(
        batch_format="pyarrow"))).to_pandas().set_index("image_id")
    return out


class TestBorderAudit:
    def test_letterbox_and_pillarbox(self, ray_session):
        out = _run([
            ("letter", png_encode(_img(32, 32, top=4, bottom=4))),
            ("pillar", png_encode(_img(32, 32, left=6, right=2))),
            ("clean", png_encode(_img(32, 32, seed=3))),
        ])
        assert out.loc["letter", ["top", "bottom", "left", "right"]
                       ].tolist() == [4, 4, 0, 0]
        assert abs(out.loc["letter", "border_frac"] - 8 / 32) < 1e-9
        assert out.loc["pillar", ["top", "bottom", "left", "right"]
                       ].tolist() == [0, 0, 6, 2]
        assert out.loc["clean", ["top", "bottom", "left", "right"]
                       ].sum() == 0
        assert out.loc["clean", "border_frac"] == 0.0

    def test_solid_image_dominant(self, ray_session):
        solid = np.full((16, 16, 3), 77, np.uint8)
        out = _run([("solid", png_encode(solid))])
        assert out.loc["solid", "border_frac"] == 1.0
        assert out.loc["solid", "dominant_frac"] == 1.0

    def test_undecodable_keeps_row(self, ray_session):
        out = _run([("bad", b"\x00\x01junk"),
                    ("good", png_encode(_img(8, 8, seed=1)))])
        assert not out.loc["bad", "decode_ok"]
        assert np.isnan(out.loc["bad", "border_frac"])
        assert out.loc["good", "decode_ok"]

    def test_dominant_fraction_half(self, ray_session):
        img = _img(16, 16, seed=2)
        img[:8] = 200  # top half one flat color
        out = _run([("half", png_encode(img))])
        assert 0.5 <= out.loc["half", "dominant_frac"] < 0.6
