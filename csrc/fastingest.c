/* fastingest: native host-side ingest kernels for carel-tpu.
 *
 * The reference's ingest is pure-Python pandas/list code (SURVEY.md §2.2,
 * hot loops at drl_classifier_ec_mmd_final_mul.py:631-731 and :100-117);
 * the TPU rebuild keeps ingest on the host but moves the per-character
 * tokenization inner loop to C for the serving path, where a single host
 * core must keep a >12k pairs/sec accelerator fed.
 *
 * encode_chars: character-level tokenization against a codepoint->id table
 * (the ZhCharTokenizer fast path). Fills caller-allocated int32 [N, L]
 * id/mask buffers, handling the literal "[SEP]" separator, whitespace
 * skipping, [CLS]/[SEP] framing and truncation exactly like the Python
 * implementation (carel_tpu/data/tokenizer.py).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>

static int is_sep_at(const void *data, int kind, Py_ssize_t pos,
                     Py_ssize_t len) {
    /* matches "[SEP]" starting at pos */
    static const Py_UCS4 SEP[5] = {'[', 'S', 'E', 'P', ']'};
    if (pos + 5 > len) return 0;
    for (int k = 0; k < 5; k++) {
        if (PyUnicode_READ(kind, data, pos + k) != SEP[k]) return 0;
    }
    return 1;
}

static PyObject *encode_chars(PyObject *self, PyObject *args) {
    PyObject *texts;
    Py_buffer table_buf, ids_buf, mask_buf;
    int max_len, cls_id, sep_id, unk_id, pad_id;

    if (!PyArg_ParseTuple(args, "Oy*w*w*iiiii", &texts, &table_buf,
                          &ids_buf, &mask_buf, &max_len, &cls_id, &sep_id,
                          &unk_id, &pad_id))
        return NULL;

    const int32_t *table = (const int32_t *)table_buf.buf;
    Py_ssize_t table_len = table_buf.len / (Py_ssize_t)sizeof(int32_t);
    int32_t *ids = (int32_t *)ids_buf.buf;
    int32_t *mask = (int32_t *)mask_buf.buf;

    Py_ssize_t n = PySequence_Size(texts);
    if (n < 0) goto fail;
    if (ids_buf.len < (Py_ssize_t)(n * max_len * sizeof(int32_t)) ||
        mask_buf.len < (Py_ssize_t)(n * max_len * sizeof(int32_t))) {
        PyErr_SetString(PyExc_ValueError, "output buffers too small");
        goto fail;
    }

    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *t = PySequence_GetItem(texts, i);
        if (!t) goto fail;
        if (!PyUnicode_Check(t)) {
            PyObject *s = PyObject_Str(t);
            Py_DECREF(t);
            if (!s) goto fail;
            t = s;
        }
        if (PyUnicode_READY(t) < 0) { Py_DECREF(t); goto fail; }
        int kind = PyUnicode_KIND(t);
        const void *data = PyUnicode_DATA(t);
        Py_ssize_t len = PyUnicode_GET_LENGTH(t);

        int32_t *row = ids + i * max_len;
        int32_t *mrow = mask + i * max_len;
        int pos_out = 0;
        row[pos_out++] = cls_id;

        for (Py_ssize_t p = 0; p < len && pos_out < max_len - 1; p++) {
            Py_UCS4 ch = PyUnicode_READ(kind, data, p);
            if (ch == '[' && is_sep_at(data, kind, p, len)) {
                row[pos_out++] = sep_id;
                p += 4;
                continue;
            }
            if (Py_UNICODE_ISSPACE(ch)) continue;
            int32_t id = unk_id;
            if ((Py_ssize_t)ch < table_len) {
                int32_t v = table[ch];
                if (v >= 0) id = v;
            }
            row[pos_out++] = id;
        }
        /* trailing [SEP]; the Python path appends one after every segment
         * and truncation keeps a final [SEP] */
        if (pos_out < max_len) {
            if (row[pos_out - 1] != sep_id || pos_out == 1)
                row[pos_out++] = sep_id;
        } else if (row[max_len - 1] != sep_id) {
            row[max_len - 1] = sep_id;
        }
        for (int k = 0; k < pos_out; k++) mrow[k] = 1;
        for (int k = pos_out; k < max_len; k++) { row[k] = pad_id; mrow[k] = 0; }
        Py_DECREF(t);
    }

    PyBuffer_Release(&table_buf);
    PyBuffer_Release(&ids_buf);
    PyBuffer_Release(&mask_buf);
    Py_RETURN_NONE;

fail:
    PyBuffer_Release(&table_buf);
    PyBuffer_Release(&ids_buf);
    PyBuffer_Release(&mask_buf);
    return NULL;
}

static PyMethodDef Methods[] = {
    {"encode_chars", encode_chars, METH_VARARGS,
     "encode_chars(texts, table_bytes, ids_buf, mask_buf, max_len, cls, sep,"
     " unk, pad)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastingest", NULL, -1, Methods,
};

PyMODINIT_FUNC PyInit__fastingest(void) {
    return PyModule_Create(&moduledef);
}
