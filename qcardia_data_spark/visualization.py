"""Visualization surface — the reference's image-grid display re-expressed
as a DataFrame stage + PNG sink (reference ``visualization/imshow.py:17-23``
``plot_data_dict``: per record a 1×3 matplotlib panel of [equalized image |
label map | overlay], batch-limited by ``figlimit``).

Spark-first shape: panel CONTENT is computed as pure SQL columns (F18
histogram equalization, label→gray scaling, F19 color overlay — all
existing, driver-verified kernels), the three h×w planes are composed
side-by-side into one h×3w RGB image with ``slice``/``concat``/``flatten``
expressions (no UDF), and the bytes leave through the executor-side
pure-stdlib PNG sink (``sources/writers.py::write_png_slices``) — one file
per record, one folder per subject, nothing funnels through the driver.
There is deliberately NO interactive display dependency (matplotlib): at
100 TB "show me the batch" means "write the panel images next to the
table", which any viewer opens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qcardia_data_spark.functions.arrays import overlay_rgb
from qcardia_data_spark.functions.geometry import histogram_equalize


def record_panels(
    df: DataFrame, img_col: str, lbl_col: str, h_col: str, w_col: str,
    n_classes: int, alpha: float = 0.5, equalize: bool = True,
    limit: int = 4,
) -> DataFrame:
    """Per-record [image | label | overlay] panel as channel-first RGB
    arrays (reference ``plot_data_dict``): the returned frame carries
    ``panel`` (flattened (3, h, 3w) doubles in [0,1]), ``panel_h``,
    ``panel_w`` — feed it straight to :func:`write_panel_pngs`.

    - image pane: histogram-equalized (``equalize=True``, the reference
      default — F18 rank-CDF) or min-max normalized intensities;
    - label pane: class ids scaled to gray by ``n_classes`` (the
      reference's ``vmax=nr_classes`` imshow);
    - overlay pane: F19 class-colored blend at ``alpha``.

    ``limit`` mirrors ``figlimit`` (≤0 = all rows — at scale keep it
    bounded; this is a preview surface, not a bulk export).
    """
    if limit > 0:
        df = df.limit(limit)
    img = F.col(img_col).cast("array<double>")
    lbl = F.col(lbl_col).cast("array<int>")
    h, w = F.col(h_col), F.col(w_col)

    if equalize:
        eq = histogram_equalize(img)
    else:
        lo, hi = F.array_min(img), F.array_max(img)
        rng = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        eq = F.transform(
            img, lambda v: F.least(F.greatest((v - lo) / rng, F.lit(0.0)), F.lit(1.0))
        )
    lbl_gray = F.transform(lbl, lambda c: c.cast("double") / F.lit(float(n_classes)))
    # overlay blends over the DISPLAYED pane (equalized or normalized) —
    # overlay_rgb expects [0,1] intensities; raw intensities would saturate
    ov = overlay_rgb(eq, lbl, alpha)

    staged = df.withColumns({
        "_eq": eq, "_lg": lbl_gray,
        "_or": ov["r"], "_og": ov["g"], "_ob": ov["b"],
    })

    def rowcat(left: str, mid: str, right: str):
        # y-th output row = left_row ++ mid_row ++ right_row (h×3w plane)
        def row(y):
            return F.concat(
                F.slice(F.col(left), y * w + 1, w),
                F.slice(F.col(mid), y * w + 1, w),
                F.slice(F.col(right), y * w + 1, w),
            )

        return F.flatten(F.transform(F.sequence(F.lit(0), h - 1), row))

    # grayscale panes replicate into each channel; overlay pane is true RGB
    panel = F.concat(
        rowcat("_eq", "_lg", "_or"),
        rowcat("_eq", "_lg", "_og"),
        rowcat("_eq", "_lg", "_ob"),
    )
    keep = [c for c in df.columns if c not in (img_col, lbl_col)]
    return staged.select(
        *keep,
        panel.alias("panel"),
        h.cast("int").alias("panel_h"),
        (w * 3).cast("int").alias("panel_w"),
    )


def write_panel_pngs(
    panels: DataFrame, out_dir: str, folder_col: str, name_col: str,
) -> None:
    """Sink for :func:`record_panels`: one ``{name}.png`` per record under
    ``out_dir/{folder}/`` via the executor-side stdlib PNG codec."""
    from qcardia_data_spark.sources.writers import write_png_slices

    write_png_slices(
        panels, out_dir, folder_col, name_col,
        array_col="panel", h_col="panel_h", w_col="panel_w", channels=3,
    )
