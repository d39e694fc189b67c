/* fastmesh: fast MEDIT (.mesh) ASCII parser.
 *
 * Native host-side IO for the framework's mesh loader. The reference
 * delegates mesh IO to meshio (python) and its geometry kernels to native
 * third-party libs (SURVEY.md SS2.9); here the hot host-side path -- parsing
 * millions of ASCII numbers -- is first-party C with a pure-python fallback
 * (insr_pde_tpu/geometry/mesh_io.py).
 *
 * Protocol (ctypes):
 *   fm_count(buf, len, &dim, &nv, &ntri, &ntet) -> 0 on success
 *     (1 = truncated, 2 = duplicate section: counts would be ambiguous)
 *   fm_parse(buf, len, dim, nv, ntri, ntet,
 *            verts[nv*3], tris[ntri*3], tets[ntet*4]) -> 0
 *     writes are bounded by the counts from fm_count, so a file that
 *     changed (or lies) between passes can never overflow the buffers.
 * Vertices are zero-padded to 3 components; element indices converted to
 * 0-based. Unknown sections are skipped. Case-insensitive keywords.
 */

#include <ctype.h>
#include <stdlib.h>
#include <string.h>

typedef long long i64;

static const char *skip_ws(const char *p, const char *end) {
    while (p < end && isspace((unsigned char)*p)) p++;
    return p;
}

static const char *next_token(const char *p, const char *end,
                              const char **tok_start, i64 *tok_len) {
    p = skip_ws(p, end);
    *tok_start = p;
    while (p < end && !isspace((unsigned char)*p)) p++;
    *tok_len = p - *tok_start;
    return p;
}

static int token_ieq(const char *tok, i64 len, const char *kw) {
    i64 n = (i64)strlen(kw);
    if (len != n) return 0;
    for (i64 i = 0; i < n; i++)
        if (tolower((unsigned char)tok[i]) != tolower((unsigned char)kw[i]))
            return 0;
    return 1;
}

static const char *parse_i64(const char *p, const char *end, i64 *out) {
    const char *tok; i64 len;
    p = next_token(p, end, &tok, &len);
    *out = strtoll(tok, NULL, 10);
    return p;
}

static const char *parse_f64(const char *p, const char *end, double *out) {
    const char *tok; i64 len;
    p = next_token(p, end, &tok, &len);
    *out = strtod(tok, NULL);
    return p;
}

/* section table: keyword, verts-per-element (0 = vertices section) */
typedef struct { const char *kw; int nv; } section_t;
static const section_t SECTIONS[] = {
    {"vertices", 0}, {"triangles", 3}, {"tetrahedra", 4},
    {"quadrilaterals", 4}, {"edges", 2}, {"hexahedra", 8},
};
#define N_SECTIONS (sizeof(SECTIONS) / sizeof(SECTIONS[0]))

static int find_section(const char *tok, i64 len) {
    for (unsigned i = 0; i < N_SECTIONS; i++)
        if (token_ieq(tok, len, SECTIONS[i].kw)) return (int)i;
    return -1;
}

/* Pass 1: discover dimension and element counts. */
int fm_count(const char *buf, i64 len, i64 *dim, i64 *nv, i64 *ntri,
             i64 *ntet) {
    const char *p = buf, *end = buf + len;
    *dim = 3; *nv = 0; *ntri = 0; *ntet = 0;
    while (p < end) {
        const char *tok; i64 tlen;
        p = next_token(p, end, &tok, &tlen);
        if (tlen == 0) break;
        if (token_ieq(tok, tlen, "meshversionformatted")) {
            i64 v; p = parse_i64(p, end, &v);
        } else if (token_ieq(tok, tlen, "dimension")) {
            p = parse_i64(p, end, dim);
        } else if (token_ieq(tok, tlen, "end")) {
            break;
        } else {
            int s = find_section(tok, tlen);
            if (s < 0) continue; /* unknown scalar keyword */
            i64 count; p = parse_i64(p, end, &count);
            int width = (SECTIONS[s].nv ? SECTIONS[s].nv : (int)*dim) + 1;
            /* duplicate counted sections make buffer sizing ambiguous */
            if (s == 0) { if (*nv) return 2; *nv = count; }
            else if (SECTIONS[s].nv == 3) { if (*ntri) return 2; *ntri = count; }
            else if (token_ieq(tok, tlen, "tetrahedra")) {
                if (*ntet) return 2; *ntet = count;
            }
            /* skip the numbers */
            for (i64 i = 0; i < count * width; i++) {
                const char *t2; i64 l2;
                p = next_token(p, end, &t2, &l2);
                if (l2 == 0) return 1; /* truncated file */
            }
        }
    }
    return 0;
}

/* Pass 2: fill caller-allocated arrays. nv/ntri/ntet are the buffer
 * capacities from fm_count; a section claiming more rows is an error. */
int fm_parse(const char *buf, i64 len, i64 dim, i64 nv, i64 ntri, i64 ntet,
             double *verts, i64 *tris, i64 *tets) {
    const char *p = buf, *end = buf + len;
    while (p < end) {
        const char *tok; i64 tlen;
        p = next_token(p, end, &tok, &tlen);
        if (tlen == 0) break;
        if (token_ieq(tok, tlen, "meshversionformatted")) {
            i64 v; p = parse_i64(p, end, &v);
        } else if (token_ieq(tok, tlen, "dimension")) {
            i64 d; p = parse_i64(p, end, &d);
        } else if (token_ieq(tok, tlen, "end")) {
            break;
        } else if (token_ieq(tok, tlen, "vertices")) {
            i64 count; p = parse_i64(p, end, &count);
            if (count > nv) return 2;
            nv -= count; /* consume capacity: duplicates cannot overflow */
            for (i64 i = 0; i < count; i++) {
                double x = 0, y = 0, z = 0, ref;
                p = parse_f64(p, end, &x);
                p = parse_f64(p, end, &y);
                if (dim >= 3) p = parse_f64(p, end, &z);
                p = parse_f64(p, end, &ref);
                verts[3 * i] = x; verts[3 * i + 1] = y; verts[3 * i + 2] = z;
            }
        } else if (token_ieq(tok, tlen, "triangles")) {
            i64 count; p = parse_i64(p, end, &count);
            if (count > ntri) return 2;
            ntri -= count;
            for (i64 i = 0; i < count; i++) {
                i64 a, b, c, ref;
                p = parse_i64(p, end, &a); p = parse_i64(p, end, &b);
                p = parse_i64(p, end, &c); p = parse_i64(p, end, &ref);
                tris[3 * i] = a - 1; tris[3 * i + 1] = b - 1;
                tris[3 * i + 2] = c - 1;
            }
        } else if (token_ieq(tok, tlen, "tetrahedra")) {
            i64 count; p = parse_i64(p, end, &count);
            if (count > ntet) return 2;
            ntet -= count;
            for (i64 i = 0; i < count; i++) {
                i64 a, b, c, d, ref;
                p = parse_i64(p, end, &a); p = parse_i64(p, end, &b);
                p = parse_i64(p, end, &c); p = parse_i64(p, end, &d);
                p = parse_i64(p, end, &ref);
                tets[4 * i] = a - 1; tets[4 * i + 1] = b - 1;
                tets[4 * i + 2] = c - 1; tets[4 * i + 3] = d - 1;
            }
        } else {
            int s = find_section(tok, tlen);
            if (s < 0) continue;
            i64 count; p = parse_i64(p, end, &count);
            int width = (SECTIONS[s].nv ? SECTIONS[s].nv : (int)dim) + 1;
            for (i64 i = 0; i < count * width; i++) {
                const char *t2; i64 l2;
                p = next_token(p, end, &t2, &l2);
                if (l2 == 0) return 1;
            }
        }
    }
    return 0;
}
