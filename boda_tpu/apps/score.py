"""PASCAL VOC detection evaluation.

Capability parity with results_io.{H,cc}: image-list loading (load_pil_t
results_io.H:163), an image DB with per-class ground-truth boxes
(img_db_t :143 — VOC XML annotations), detection-results scoring with
matched-GT AP/mAP computation and PR curves (modes score :456 /
score-files :470).

Formats:
  image list   — one image id per line (VOC ImageSets format)
  annotations  — VOC XML per image: <object><name/><bndbox/></object>
  detections   — text: 'img_id score x0 y0 x1 y1' per line, per-class file
                 (the VOC comp3/comp4 results format)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from ..core.config import Attr
from ..core.error import RtErr
from ..core.has_main import HasMain, mode


@dataclass
class GtBox:
    box: tuple[float, float, float, float]  # x0,y0,x1,y1
    difficult: bool = False
    matched: bool = False


@dataclass
class ImgInfo:
    ident: str
    gt: dict[str, list[GtBox]] = field(default_factory=dict)


def load_pil(imgset_fn, ann_dir=None) -> dict[str, ImgInfo]:
    """Load a PASCAL image list + (optionally) its XML annotations."""
    db: dict[str, ImgInfo] = {}
    for line in Path(imgset_fn).read_text().splitlines():
        ident = line.split()[0].strip() if line.strip() else ""
        if not ident:
            continue
        ii = ImgInfo(ident)
        if ann_dir:
            ann = Path(ann_dir) / f"{ident}.xml"
            if ann.exists():
                root = ET.parse(str(ann)).getroot()
                for obj in root.findall("object"):
                    cls = obj.findtext("name", "unknown")
                    bb = obj.find("bndbox")
                    box = (float(bb.findtext("xmin")), float(bb.findtext("ymin")),
                           float(bb.findtext("xmax")), float(bb.findtext("ymax")))
                    diff = obj.findtext("difficult", "0") == "1"
                    ii.gt.setdefault(cls, []).append(GtBox(box, diff))
        db[ident] = ii
    return db


def box_iou(a, b) -> float:
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(0.0, ix1 - ix0), max(0.0, iy1 - iy0)
    inter = iw * ih
    ua = ((a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua if ua > 0 else 0.0


def read_results_file(path) -> list[tuple[str, float, tuple]]:
    """'img_id score x0 y0 x1 y1' per line."""
    out = []
    for line in Path(path).read_text().splitlines():
        parts = line.split()
        if len(parts) != 6:
            if line.strip():
                raise RtErr(f"bad detection result line: '{line}'")
            continue
        out.append((parts[0], float(parts[1]), tuple(float(x) for x in parts[2:])))
    return out


def score_results_for_class(db: dict[str, ImgInfo], cls: str,
                            dets: list[tuple[str, float, tuple]],
                            iou_thresh: float = 0.5,
                            use_07_metric: bool = False):
    """VOC AP: greedy match by descending score; difficult GTs ignored.
    Returns (ap, prc) where prc is the (recall, precision, score) curve."""
    for ii in db.values():
        for g in ii.gt.get(cls, []):
            g.matched = False
    npos = sum(1 for ii in db.values() for g in ii.gt.get(cls, [])
               if not g.difficult)
    dets = sorted(dets, key=lambda d: -d[1])
    tp = np.zeros(len(dets))
    fp = np.zeros(len(dets))
    for i, (ident, score, box) in enumerate(dets):
        ii = db.get(ident)
        gts = ii.gt.get(cls, []) if ii else []
        best, best_iou = None, iou_thresh
        for g in gts:
            iou = box_iou(box, g.box)
            if iou >= best_iou:
                best, best_iou = g, iou
        if best is None:
            fp[i] = 1
        elif best.difficult:
            pass  # ignored
        elif best.matched:
            fp[i] = 1
        else:
            best.matched = True
            tp[i] = 1
    ctp, cfp = np.cumsum(tp), np.cumsum(fp)
    rec = ctp / max(npos, 1)
    prec = ctp / np.maximum(ctp + cfp, 1e-12)
    if use_07_metric:
        ap = 0.0
        for t in np.linspace(0, 1, 11):
            p = prec[rec >= t].max() if (rec >= t).any() else 0.0
            ap += p / 11.0
    else:
        mrec = np.concatenate([[0.0], rec, [1.0]])
        mpre = np.concatenate([[0.0], prec, [0.0]])
        for i in range(len(mpre) - 2, -1, -1):
            mpre[i] = max(mpre[i], mpre[i + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        ap = float(((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]).sum())
    scores = np.array([d[1] for d in dets])
    return ap, (rec, prec, scores)


@mode("score", help="score PASCAL-format detection results (AP/mAP + PR curves)")
class Score(HasMain):
    imgset_fn = Attr(str, req=True, help="image list file")
    ann_dir = Attr(str, req=True, help="VOC Annotations dir (XML per image)")
    res_fns = Attr(dict[str, str], req=True,
                   help="per-class results files, e.g. (dog=res_dog.txt)")
    iou_thresh = Attr(float, default=0.5)
    use_07_metric = Attr(bool, default=False)
    prc_png_fn = Attr(str, default="", help="PR-curve plot (per class), '{cls}' expands")
    summary_fn = Attr(str, default="")

    def main(self):
        db = load_pil(self.imgset_fn, self.ann_dir)
        aps = {}
        lines = []
        for cls, fn in sorted(self.res_fns.items()):
            dets = read_results_file(fn)
            ap, (rec, prec, scores) = score_results_for_class(
                db, cls, dets, self.iou_thresh, self.use_07_metric)
            aps[cls] = ap
            line = f"{cls}: AP={ap:.4f} ({len(dets)} dets)"
            print(line)
            lines.append(line)
            if self.prc_png_fn:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt
                fig, ax = plt.subplots(figsize=(5, 4))
                ax.plot(rec, prec)
                ax.set_xlabel("recall")
                ax.set_ylabel("precision")
                ax.set_title(f"{cls} AP={ap:.3f}")
                ax.set_xlim(0, 1)
                ax.set_ylim(0, 1.05)
                fig.savefig(self.out_path(self.prc_png_fn.replace("{cls}", cls)),
                            dpi=80)
                plt.close(fig)
        mean_ap = float(np.mean(list(aps.values()))) if aps else 0.0
        line = f"mAP={mean_ap:.4f} over {len(aps)} classes"
        print(line)
        lines.append(line)
        if self.summary_fn:
            self.out_path(self.summary_fn).write_text("\n".join(lines) + "\n")
