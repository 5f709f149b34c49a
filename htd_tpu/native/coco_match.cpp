/* Native COCO detection-matching core (CPython extension).
 *
 * Plays the role pycocotools' C backend plays for the reference
 * (datasets/coco.py:363-544 -> COCOeval): the per-(image, category)
 * greedy matching across IoU thresholds, which dominates evaluation time
 * when run from Python. Exact COCO protocol semantics: dets sorted by
 * score desc, gts ignore-last, crowd gts matched as IoF and re-usable,
 * ignore-break rule, unmatched out-of-area dets ignored.
 *
 * Exposed:
 *   match_img_cat(dt_boxes (D,4) f64, dt_scores (D,) f64,
 *                 gt_boxes (G,4) f64, gt_crowd (G,) u8,
 *                 area_min, area_max, iou_thrs (T,) f64)
 *     -> (dt_matched (T,D) u8, dt_ignore (T,D) u8, num_gt int,
 *         dt_order (D,) i64)
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

struct Box {
  double x1, y1, x2, y2;
  double area() const { return (x2 - x1) * (y2 - y1); }
};

double iou(const Box& d, const Box& g, bool crowd) {
  double ix1 = std::max(d.x1, g.x1), iy1 = std::max(d.y1, g.y1);
  double ix2 = std::min(d.x2, g.x2), iy2 = std::min(d.y2, g.y2);
  double iw = std::max(0.0, ix2 - ix1), ih = std::max(0.0, iy2 - iy1);
  double inter = iw * ih;
  double uni = crowd ? d.area() : d.area() + g.area() - inter;
  if (uni <= 0.0) return 0.0;
  return inter / uni;
}

// Parse a contiguous buffer of doubles from any object supporting buffer
// protocol via PyObject_GetBuffer.
struct BufD {
  Py_buffer view{};
  bool ok = false;
  BufD(PyObject* o, int ndim_expected) {
    if (PyObject_GetBuffer(o, &view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) == 0) {
      ok = (view.ndim == ndim_expected) &&
           (view.format == nullptr || strcmp(view.format, "d") == 0);
      if (!ok) PyBuffer_Release(&view);
    }
  }
  ~BufD() { if (ok) PyBuffer_Release(&view); }
  const double* data() const { return static_cast<const double*>(view.buf); }
  Py_ssize_t dim(int i) const { return view.shape[i]; }
};

struct BufU8 {
  Py_buffer view{};
  bool ok = false;
  BufU8(PyObject* o) {
    if (PyObject_GetBuffer(o, &view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) == 0) {
      ok = (view.ndim == 1) &&
           (view.format == nullptr || strcmp(view.format, "B") == 0 ||
            strcmp(view.format, "?") == 0 || strcmp(view.format, "b") == 0);
      if (!ok) PyBuffer_Release(&view);
    }
  }
  ~BufU8() { if (ok) PyBuffer_Release(&view); }
  const uint8_t* data() const { return static_cast<const uint8_t*>(view.buf); }
};

PyObject* match_img_cat(PyObject*, PyObject* args) {
  PyObject *dt_boxes_o, *dt_scores_o, *gt_boxes_o, *gt_crowd_o, *iou_thrs_o;
  double area_min, area_max;
  if (!PyArg_ParseTuple(args, "OOOOddO", &dt_boxes_o, &dt_scores_o,
                        &gt_boxes_o, &gt_crowd_o, &area_min, &area_max,
                        &iou_thrs_o))
    return nullptr;

  BufD dtb(dt_boxes_o, 2), dts(dt_scores_o, 1), gtb(gt_boxes_o, 2),
      thrs(iou_thrs_o, 1);
  BufU8 gtc(gt_crowd_o);
  if (!dtb.ok || !dts.ok || !gtb.ok || !gtc.ok || !thrs.ok) {
    PyErr_SetString(PyExc_TypeError,
                    "expected C-contiguous float64/uint8 arrays");
    return nullptr;
  }
  const Py_ssize_t D = dtb.dim(0), G = gtb.dim(0), T = thrs.dim(0);

  std::vector<Box> dbox(D), gbox(G);
  for (Py_ssize_t i = 0; i < D; i++)
    dbox[i] = {dtb.data()[i * 4], dtb.data()[i * 4 + 1],
               dtb.data()[i * 4 + 2], dtb.data()[i * 4 + 3]};
  for (Py_ssize_t i = 0; i < G; i++)
    gbox[i] = {gtb.data()[i * 4], gtb.data()[i * 4 + 1],
               gtb.data()[i * 4 + 2], gtb.data()[i * 4 + 3]};

  // gt ignore flags + sort: ignore-last (stable)
  std::vector<uint8_t> gig(G);
  for (Py_ssize_t i = 0; i < G; i++) {
    double a = gbox[i].area();
    gig[i] = gtc.data()[i] || a < area_min || a > area_max;
  }
  std::vector<int> gord(G);
  std::iota(gord.begin(), gord.end(), 0);
  std::stable_sort(gord.begin(), gord.end(),
                   [&](int a, int b) { return gig[a] < gig[b]; });

  // dt sort: score desc (stable)
  std::vector<int> dord(D);
  std::iota(dord.begin(), dord.end(), 0);
  std::stable_sort(dord.begin(), dord.end(), [&](int a, int b) {
    return dts.data()[a] > dts.data()[b];
  });

  // precompute ious (sorted det) x (sorted gt)
  std::vector<double> ious(static_cast<size_t>(D) * G);
  for (Py_ssize_t di = 0; di < D; di++)
    for (Py_ssize_t gi = 0; gi < G; gi++)
      ious[di * G + gi] =
          iou(dbox[dord[di]], gbox[gord[gi]], gtc.data()[gord[gi]] != 0);

  std::vector<uint8_t> out_matched(static_cast<size_t>(T) * D, 0);
  std::vector<uint8_t> out_ignore(static_cast<size_t>(T) * D, 0);

  for (Py_ssize_t ti = 0; ti < T; ti++) {
    double thr = thrs.data()[ti];
    std::vector<int> gmatch(G, -1);
    for (Py_ssize_t di = 0; di < D; di++) {
      double best = std::min(thr, 1.0 - 1e-10);
      int bestg = -1;
      for (Py_ssize_t gi = 0; gi < G; gi++) {
        int gidx = gord[gi];
        if (gmatch[gi] >= 0 && !gtc.data()[gidx]) continue;
        if (bestg >= 0 && !gig[gord[bestg]] && gig[gidx]) break;
        double v = ious[di * G + gi];
        if (v < best) continue;
        best = v;
        bestg = static_cast<int>(gi);
      }
      if (bestg >= 0) {
        gmatch[bestg] = static_cast<int>(di);
        bool ig = gig[gord[bestg]] != 0;
        out_matched[ti * D + di] = ig ? 0 : 1;
        out_ignore[ti * D + di] = ig ? 1 : 0;
      } else {
        double a = dbox[dord[di]].area();
        if (a < area_min || a > area_max) out_ignore[ti * D + di] = 1;
      }
    }
  }

  long num_gt = 0;
  for (Py_ssize_t i = 0; i < G; i++)
    if (!gig[i]) num_gt++;

  PyObject* m = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out_matched.data()), T * D);
  PyObject* ig = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out_ignore.data()), T * D);
  PyObject* order = PyList_New(D);
  for (Py_ssize_t i = 0; i < D; i++)
    PyList_SET_ITEM(order, i, PyLong_FromLong(dord[i]));
  PyObject* ret = Py_BuildValue("(NNlN)", m, ig, num_gt, order);
  return ret;
}

PyMethodDef methods[] = {
    {"match_img_cat", match_img_cat, METH_VARARGS,
     "COCO per-(image,category) greedy matching across IoU thresholds"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "coco_match",
                         "native COCO matching core", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_coco_match(void) { return PyModule_Create(&moduledef); }
