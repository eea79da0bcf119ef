// Native .geno chunk tokenizer.
//
// Replaces the numpy vectorized parser for the hot path: one pass over a
// decompressed text chunk, emitting
//   * positions  int64[n]
//   * scaffold run-length breaks (line index + offset/length of the name)
//   * allele codes int8 into a caller-provided [H, capacity] row-major matrix
//     (selected individuals only, haplotype rows in caller-specified order).
//
// Grammar per line (fast path; any violation -> return the byte offset of the
// offending line so Python can re-parse the remainder with its fallback):
//   scaffold '\t' digits '\t' GT ('\t' GT)* '\n'
// with fixed per-column GT field widths established by the caller.
//
// Genotype decoding matches genomics_general semantics
// (reference genomics.py:317-378): characters at even positions for 'phased',
// consecutive for 'pairs'/'alleles'/'haplo', IUPAC expansion for 'diplo';
// any non-ACGTN character poisons the whole genotype to missing.
//
// Build: g++ -O3 -shared -fPIC -o libgenoparser.so geno_parser.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#ifdef HAVE_LIBDEFLATE
#include <libdeflate.h>
#endif
#ifdef HAVE_ZLIB
#include <zlib.h>
#endif

namespace {

constexpr int8_t MISSING = -1;
constexpr int8_t POISON = -2;

struct Luts {
  int8_t base[256];
  int8_t diplo1[256];
  int8_t diplo2[256];
  int8_t diploHomo[256];
  Luts() {
    for (int i = 0; i < 256; ++i)
      base[i] = diplo1[i] = diplo2[i] = diploHomo[i] = POISON;
    base['A'] = 0; base['C'] = 1; base['G'] = 2; base['T'] = 3;
    base['N'] = MISSING;
    const char* diplo = "ACGKMNSRTWY";
    const char* pair1 = "ACGGANCATAC";
    const char* pair2 = "ACGTCNGGTTT";
    const char* homo  = "ACGNNNNNTNN";
    for (int i = 0; i < 11; ++i) {
      unsigned char d = diplo[i];
      diplo1[d] = base[(unsigned char)pair1[i]];
      diplo2[d] = base[(unsigned char)pair2[i]];
      diploHomo[d] = base[(unsigned char)homo[i]];
    }
  }
};
const Luts LUT;

}  // namespace

extern "C" {

// geno_format codes
enum { FMT_PHASED = 0, FMT_PAIRS = 1, FMT_HAPLO = 2, FMT_DIPLO = 3 };

// Parse a chunk of complete lines.
//
// buf/len          : decompressed text (must end at a line boundary)
// gt_block_len     : total byte length of the genotype block per line
// n_sel            : number of selected individuals
// sel_offsets      : byte offset of each selected individual's field within
//                    the genotype block
// sel_ploidy       : haplotypes per selected individual
// sel_row_start    : for individual j, its haplotypes go to rows
//                    row_index[sel_row_start[j] .. +sel_ploidy[j])
// row_index        : flat list of destination row ids
// fmt              : genotype format code
// alleles          : out int8 [n_rows, capacity] row-major
// row_stride       : capacity (elements per row)
// positions        : out int64[capacity]
// scaf_breaks      : out int64[3*max_breaks]: (line_idx, name_off, name_len)
// n_breaks_out     : number of breaks written
// n_lines_out      : lines successfully parsed
//
// Returns 0 on success; otherwise the 1-based byte offset of the first
// unparseable line (caller reparses from there with the fallback), or -1 if
// scaf_breaks capacity was exceeded.
int64_t parse_geno_chunk(
    const uint8_t* buf, int64_t len, int64_t gt_block_len,
    int32_t n_sel, const int64_t* sel_offsets, const int32_t* sel_ploidy,
    const int64_t* sel_row_start, const int32_t* row_index, int32_t fmt,
    int8_t* alleles, int64_t row_stride, int64_t* positions,
    int64_t* scaf_breaks, int64_t max_breaks,
    int64_t* n_breaks_out, int64_t* n_lines_out) {
  int64_t i = 0;
  int64_t line = 0;
  int64_t n_breaks = 0;
  const uint8_t* prev_name = nullptr;
  int64_t prev_name_len = -1;

  while (i < len) {
    int64_t line_start = i;
    if (buf[i] == '#') {  // comment line: skip to newline
      while (i < len && buf[i] != '\n') ++i;
      ++i;
      continue;
    }
    if (buf[i] == '\n') { ++i; continue; }

    // scaffold
    int64_t name_off = i;
    while (i < len && buf[i] != '\t' && buf[i] != '\n') ++i;
    if (i >= len || buf[i] != '\t') { *n_lines_out = line; *n_breaks_out = n_breaks; return line_start + 1; }
    int64_t name_len = i - name_off;
    ++i;

    // position
    int64_t pos = 0;
    int64_t dstart = i;
    while (i < len && buf[i] >= '0' && buf[i] <= '9') {
      pos = pos * 10 + (buf[i] - '0');
      ++i;
    }
    if (i == dstart || i >= len || buf[i] != '\t') { *n_lines_out = line; *n_breaks_out = n_breaks; return line_start + 1; }
    ++i;

    // genotype block
    int64_t gstart = i;
    if (gstart + gt_block_len > len || buf[gstart + gt_block_len] != '\n') {
      *n_lines_out = line; *n_breaks_out = n_breaks; return line_start + 1;
    }

    // scaffold run tracking
    if (prev_name_len != name_len ||
        std::memcmp(buf + name_off, prev_name, (size_t)name_len) != 0) {
      if (n_breaks >= max_breaks) { *n_lines_out = line; *n_breaks_out = n_breaks; return -1; }
      scaf_breaks[3 * n_breaks] = line;
      scaf_breaks[3 * n_breaks + 1] = name_off;
      scaf_breaks[3 * n_breaks + 2] = name_len;
      ++n_breaks;
      prev_name = buf + name_off;
      prev_name_len = name_len;
    }

    positions[line] = pos;

    // decode selected genotype fields
    for (int32_t j = 0; j < n_sel; ++j) {
      const uint8_t* f = buf + gstart + sel_offsets[j];
      int32_t k = sel_ploidy[j];
      const int32_t* rows = row_index + sel_row_start[j];
      if (fmt == FMT_PHASED || fmt == FMT_PAIRS || fmt == FMT_HAPLO) {
        int step = (fmt == FMT_PHASED) ? 2 : 1;
        bool bad = false;
        int8_t tmp[16];
        for (int32_t a = 0; a < k; ++a) {
          int8_t c = LUT.base[f[a * step]];
          if (c == POISON) bad = true;
          tmp[a] = c;
        }
        if (bad) {
          for (int32_t a = 0; a < k; ++a)
            alleles[(int64_t)rows[a] * row_stride + line] = MISSING;
        } else {
          for (int32_t a = 0; a < k; ++a)
            alleles[(int64_t)rows[a] * row_stride + line] = tmp[a];
        }
      } else {  // FMT_DIPLO
        uint8_t b = f[0];
        if (k == 2) {
          int8_t c1 = LUT.diplo1[b];
          int8_t c2 = LUT.diplo2[b];
          if (c1 == POISON || c2 == POISON) { c1 = MISSING; c2 = MISSING; }
          alleles[(int64_t)rows[0] * row_stride + line] = c1;
          alleles[(int64_t)rows[1] * row_stride + line] = c2;
        } else {
          int8_t c = LUT.diploHomo[b];
          alleles[(int64_t)rows[0] * row_stride + line] = (c == POISON) ? MISSING : c;
        }
      }
    }

    i = gstart + gt_block_len + 1;  // past newline
    ++line;
  }
  *n_lines_out = line;
  *n_breaks_out = n_breaks;
  return 0;
}

// Biallelic wire-plane packer for the pairwise-distance device path.
//
// The pair-count kernel only needs, per site, which haplotypes are called
// and which carry the site's "alt" allele: mismatch/shared pair counts are
// invariant to the actual base identities at biallelic sites.  Packing the
// span as two 1-bit planes (called, alt) ships 2 bits/site/haplotype over
// the slow device link instead of the 3 bits of the generic 2-bit-code +
// miss-plane format (kernels/transfer.pack_span).
//
// alleles    : int8 [n_rows x row_stride] span, values -1..3 (only the first
//              n_sites columns are read)
// called/alt : out uint8 [n_rows x sp8] bit planes, little-endian bit order
//              (site s -> byte s/8, bit s%8); sp8 = padded_sites/8 supplied
//              by the caller (pad bits are written 0 = not called)
// refalt     : out uint8 [n_sites] (ref | alt<<2) per-site allele codes
//              (ref = lowest code present, alt = highest; equal when the
//              site is invariant or empty)
// ex_idx     : out int32 [max_ex] site indices with >2 distinct called
//              alleles.  Exception sites are cleared in both planes (they
//              contribute nothing via the matmul path); the caller ships
//              their raw codes separately and the kernel patches them in.
// Returns the number of exceptions, or -1 if max_ex was exceeded.
int64_t pack_pair_planes(
    const int8_t* alleles, int64_t n_rows, int64_t row_stride,
    int64_t n_sites, uint8_t* called, uint8_t* alt, int64_t sp8,
    uint8_t* refalt, int32_t* ex_idx, int64_t max_ex) {
  // pass 1: per-site presence mask of the 4 allele codes
  uint8_t* seen = new uint8_t[(size_t)n_sites]();
  for (int64_t h = 0; h < n_rows; ++h) {
    const int8_t* row = alleles + h * row_stride;
    for (int64_t s = 0; s < n_sites; ++s) {
      int8_t c = row[s];
      seen[s] |= (c >= 0) ? (uint8_t)(1u << c) : 0u;
    }
  }
  // pass 1.5: ref/alt codes + exception detection
  int64_t n_ex = 0;
  uint8_t* is_ex = new uint8_t[(size_t)n_sites]();
  for (int64_t s = 0; s < n_sites; ++s) {
    uint8_t m = seen[s];
    int pc = __builtin_popcount(m);
    if (pc > 2) {
      if (n_ex >= max_ex) { delete[] seen; delete[] is_ex; return -1; }
      ex_idx[n_ex++] = (int32_t)s;
      is_ex[s] = 1;
      refalt[s] = 0;
      continue;
    }
    if (m == 0) { refalt[s] = 0; continue; }
    int ref = __builtin_ctz(m);
    int a = 31 - __builtin_clz((unsigned)m);
    refalt[s] = (uint8_t)(ref | (a << 2));
  }
  // pass 2: emit bit planes
  for (int64_t h = 0; h < n_rows; ++h) {
    const int8_t* row = alleles + h * row_stride;
    uint8_t* crow = called + h * sp8;
    uint8_t* arow = alt + h * sp8;
    int64_t s = 0;
    int64_t full = n_sites / 8;
    for (int64_t b = 0; b < full; ++b) {
      uint8_t cb = 0, ab = 0;
      for (int k = 0; k < 8; ++k, ++s) {
        int8_t c = row[s];
        uint8_t ok = (uint8_t)((c >= 0) & !is_ex[s]);
        cb |= (uint8_t)(ok << k);
        ab |= (uint8_t)((ok & (c == (int8_t)(refalt[s] >> 2))) << k);
      }
      crow[b] = cb;
      arow[b] = ab;
    }
    if (s < n_sites) {
      uint8_t cb = 0, ab = 0;
      for (int k = 0; s < n_sites; ++k, ++s) {
        int8_t c = row[s];
        uint8_t ok = (uint8_t)((c >= 0) & !is_ex[s]);
        cb |= (uint8_t)(ok << k);
        ab |= (uint8_t)((ok & (c == (int8_t)(refalt[s] >> 2))) << k);
      }
      crow[full] = cb;
      arow[full] = ab;
    }
    for (int64_t b = (n_sites + 7) / 8; b < sp8; ++b) {
      crow[b] = 0;
      arow[b] = 0;
    }
  }
  delete[] seen;
  delete[] is_ex;
  return n_ex;
}

// Numeric name-table tokenizer: lines of
//   name SEP number (SEP number)*
// with SEP in {tab, space, comma} and a fixed count of numbers per line.
// Numbers are [-]digits[.digits] or nan/NaN (no exponents; any other token
// aborts with the line's byte offset so Python can fall back).  Used for
// the freq->sfs baseCounts/targetCounts tables and windowStats columns,
// where per-line Python parsing dominates genome-scale runs.
//
// Outputs mirror parse_geno_chunk: values double[cap * n_vals], positions
// of name runs as (line, name_off, name_len) triples.
int64_t parse_name_table(
    const uint8_t* buf, int64_t len, int32_t n_vals,
    double* values, int64_t cap,
    int64_t* name_breaks, int64_t max_breaks,
    int64_t* n_breaks_out, int64_t* n_lines_out) {
  int64_t i = 0, line = 0, n_breaks = 0;
  const uint8_t* prev_name = nullptr;
  int64_t prev_name_len = -1;
  while (i < len) {
    int64_t line_start = i;
    if (buf[i] == '#') { while (i < len && buf[i] != '\n') ++i; ++i; continue; }
    if (buf[i] == '\n' || buf[i] == '\r') { ++i; continue; }
    if (line >= cap) { *n_lines_out = line; *n_breaks_out = n_breaks; return line_start + 1; }
    // name field
    int64_t name_off = i;
    while (i < len && buf[i] != '\t' && buf[i] != ' ' && buf[i] != '\n') ++i;
    if (i >= len || buf[i] == '\n') { *n_lines_out = line; *n_breaks_out = n_breaks; return line_start + 1; }
    int64_t name_len = i - name_off;
    ++i;
    if (prev_name_len != name_len ||
        std::memcmp(buf + name_off, prev_name, (size_t)name_len) != 0) {
      if (n_breaks >= max_breaks) { *n_lines_out = line; *n_breaks_out = n_breaks; return -1; }
      name_breaks[3 * n_breaks] = line;
      name_breaks[3 * n_breaks + 1] = name_off;
      name_breaks[3 * n_breaks + 2] = name_len;
      ++n_breaks;
      prev_name = buf + name_off;
      prev_name_len = name_len;
    }
    double* out = values + line * (int64_t)n_vals;
    for (int32_t v = 0; v < n_vals; ++v) {
      while (i < len && (buf[i] == '\t' || buf[i] == ' ' || buf[i] == ','))
        ++i;
      if (i >= len || buf[i] == '\n') { *n_lines_out = line; *n_breaks_out = n_breaks; return line_start + 1; }
      bool neg = false;
      if (buf[i] == '-') { neg = true; ++i; }
      if (i < len && (buf[i] == 'n' || buf[i] == 'N')) {
        if (i + 2 < len && (buf[i+1]=='a'||buf[i+1]=='A')
            && (buf[i+2]=='n'||buf[i+2]=='N')) {
          out[v] = 0.0 / 0.0;
          i += 3;
          continue;
        }
        *n_lines_out = line; *n_breaks_out = n_breaks; return line_start + 1;
      }
      // exact decimal fast path: integer mantissa / power of ten is
      // correctly rounded (both operands exact in double for <= 18 digit
      // mantissas and <= 22 frac digits), so results match strtod/Python
      // float() bit-for-bit on these simple decimals
      static const double P10[23] = {
          1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9, 1e10, 1e11,
          1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18, 1e19, 1e20, 1e21, 1e22};
      int64_t dstart = i;
      uint64_t mant = 0;
      int digits = 0, frac = 0;
      while (i < len && buf[i] >= '0' && buf[i] <= '9') {
        mant = mant * 10 + (uint64_t)(buf[i] - '0');
        ++digits;
        ++i;
      }
      if (i == dstart) { *n_lines_out = line; *n_breaks_out = n_breaks; return line_start + 1; }
      if (i < len && buf[i] == '.') {
        ++i;
        while (i < len && buf[i] >= '0' && buf[i] <= '9') {
          mant = mant * 10 + (uint64_t)(buf[i] - '0');
          ++digits;
          ++frac;
          ++i;
        }
      }
      if (digits > 18 || frac > 22) {  // exactness guarantee gone: bail
        *n_lines_out = line; *n_breaks_out = n_breaks; return line_start + 1;
      }
      double val = (double)mant / P10[frac];
      out[v] = neg ? -val : val;
    }
    // rest of line must be separators/newline
    while (i < len && buf[i] != '\n') {
      if (buf[i] != '\t' && buf[i] != ' ' && buf[i] != '\r' && buf[i] != ',') {
        *n_lines_out = line; *n_breaks_out = n_breaks; return line_start + 1;
      }
      ++i;
    }
    ++i;
    ++line;
  }
  *n_lines_out = line;
  *n_breaks_out = n_breaks;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Text FORMATTING fast paths.  The engine's genome-scale CLIs are bounded by
// per-row Python string assembly (freq: ~50M str ops for a 2M-site file;
// popgenWindows: ~300k round()+str() calls); these emitters produce the exact
// same bytes in one C pass.

namespace {

// unsigned itoa, returns chars written
inline int u64toa(uint64_t v, uint8_t* out) {
  uint8_t tmp[20];
  int n = 0;
  do { tmp[n++] = (uint8_t)('0' + v % 10); v /= 10; } while (v);
  for (int i = 0; i < n; ++i) out[i] = tmp[n - 1 - i];
  return n;
}

inline int i64toa(int64_t v, uint8_t* out) {
  if (v < 0) { out[0] = '-'; return 1 + u64toa((uint64_t)(-v), out + 1); }
  return u64toa((uint64_t)v, out);
}

// str(round(np.float64(v), round_to)) exactly (io/writers.fmt_float):
//  * numpy __round__ = scale, rint (round-half-even on the double product),
//    unscale -- NOT Python's correctly-rounded decimal round;
//  * str() of the result z = nearest(r / 10^rt) is the shortest decimal that
//    round-trips, which for such quotients is "%.{rt}f" with trailing zeros
//    trimmed (keeping one fractional digit) -- see analysis in the repo's
//    format tests.  Requires |v|*10^rt < 2^53; caller pre-checks |v| < 1e12.
// Returns chars written.
inline int fmt_round_repr(double v, int round_to, double scale, uint8_t* out) {
  if (v != v) { out[0]='n'; out[1]='a'; out[2]='n'; return 3; }
  double z = __builtin_nearbyint(v * scale) / scale;
  int n = snprintf((char*)out, 40, "%.*f", round_to, z);
  if (n <= 0 || n >= 40) return -1;
  // trim trailing zeros, keep >= 1 digit after the dot
  int dot = -1;
  for (int i = 0; i < n; ++i) if (out[i] == '.') { dot = i; break; }
  if (dot < 0) return n;                  // inf
  int end = n;
  while (end - 1 > dot + 1 && out[end - 1] == '0') --end;
  return end;
}

// str(int(v)) if v==v else "nan" (io/writers.fmt_int_or_nan); truncation
// toward zero like Python int()
inline int fmt_int_or_nan(double v, uint8_t* out) {
  if (v != v) { out[0]='n'; out[1]='a'; out[2]='n'; return 3; }
  return i64toa((int64_t)v, out);
}

}  // namespace

extern "C" {

// Fused per-site pop base counting + row formatting for freq's default
// counts mode (reference freq.py:52-60: "a,c,g,t" per population per site).
// Counting here replaces the device round trip: the per-site counts ARE the
// output, so shipping them over the ~30 MB/s device link costs more than
// counting in the same pass that formats them.
//
// alleles     : int8 [n_rows x row_stride] parsed chunk (column s = site s)
// pop_rows    : concatenated row indices per population
// pop_starts  : [n_pops+1] offsets into pop_rows
// positions   : int64 [n_sites]
// scaf_*/run_*: per-run scaffold names: run k covers sites
//               [run_bounds[k], run_bounds[k+1]) and has name bytes
//               scaf_blob[run_off[k] .. +run_len[k])
// start_site  : resume point (sites before it are already emitted)
// out/out_cap : output buffer; the function fills until the next line might
//               not fit, then returns
// n_done_out  : total sites emitted AFTER this call (resume cursor)
// Returns bytes written this call (>= 0), or -1 on malformed run bounds.
int64_t freq_counts_rows(
    const int8_t* alleles, int64_t row_stride, int64_t n_sites,
    const int32_t* pop_rows, const int64_t* pop_starts, int32_t n_pops,
    const int64_t* positions,
    const uint8_t* scaf_blob, const int64_t* run_off, const int64_t* run_len,
    const int64_t* run_bounds, int64_t n_runs,
    int64_t start_site, uint8_t* out, int64_t out_cap,
    int64_t* n_done_out) {
  int64_t off = 0;
  int64_t s = start_site;
  // find the run containing start_site
  int64_t r = 0;
  while (r < n_runs && run_bounds[r + 1] <= s) ++r;
  for (; r < n_runs; ++r) {
    const uint8_t* name = scaf_blob + run_off[r];
    int64_t nlen = run_len[r];
    int64_t rend = run_bounds[r + 1];
    if (rend > n_sites) return -1;
    // worst line: name + tab + 20-digit pos + pops * 4 * 11 + seps
    int64_t worst = nlen + 22 + (int64_t)n_pops * 48;
    for (; s < rend; ++s) {
      if (off + worst > out_cap) { *n_done_out = s; return off; }
      memcpy(out + off, name, (size_t)nlen);
      off += nlen;
      out[off++] = '\t';
      off += u64toa((uint64_t)positions[s], out + off);
      for (int32_t p = 0; p < n_pops; ++p) {
        uint32_t cnt[4] = {0, 0, 0, 0};
        const int32_t* rows = pop_rows + pop_starts[p];
        int64_t nr = pop_starts[p + 1] - pop_starts[p];
        for (int64_t j = 0; j < nr; ++j) {
          int8_t c = alleles[(int64_t)rows[j] * row_stride + s];
          if (c >= 0) ++cnt[c];
        }
        out[off++] = '\t';
        off += u64toa(cnt[0], out + off);
        out[off++] = ',';
        off += u64toa(cnt[1], out + off);
        out[off++] = ',';
        off += u64toa(cnt[2], out + off);
        out[off++] = ',';
        off += u64toa(cnt[3], out + off);
      }
      out[off++] = '\n';
    }
  }
  *n_done_out = s;
  return off;
}

// Fused baseCounts-table parse + SFS target selection (the engine's
// freq -> sfs fast path; reference sfs.py:60-85, 464-477).  One pass over
// the text: per line parses name, position, and n_cols "a,c,g,t" integer
// fields, then computes the per-ingroup-pop target-allele counts:
//   * polarized (out_col >= 0): target = first allele present in the
//     ingroup and absent from the outgroup, else first allele absent from
//     the ingroup; ok gate 1 <= alleles(in|out) <= 2 and exactly one
//     outgroup allele;
//   * folded: target = totalCounts.argsort()[-2].  numpy's default argsort
//     is NOT stable on ties (SIMD dispatch), so lines where the choice is
//     ambiguous AND affects the output (second-highest total tied with a
//     distinct nonzero value) are flagged in `ambig`; the caller re-resolves
//     exactly those lines with np.argsort on the raw counts written to
//     flag_counts.
// Any token that is not a plain non-negative integer (nan, sign, decimal
// point, exponent) aborts with the line's byte offset; counts > 2^31 abort
// likewise (caller falls back to the float64 table parser).
//
// tgt        : out int32 [cap, n_in]
// ok         : out uint8 [cap]
// ambig      : out uint8 [cap]
// flag_counts: out int32 [flag_cap, (n_in+1)*4] raw counts of flagged lines
//              (ingroup pops then total)
// flag_idx   : out int64 [flag_cap] line numbers of flagged lines
// nhap_max   : in/out int32 [n_in] running max of per-pop count sums
// Returns 0 on success, byte offset+1 of the first bad line, -1 on break
// overflow, -2 on flag overflow.
int64_t parse_base_counts_targets(
    const uint8_t* buf, int64_t len, int32_t n_cols,
    const int32_t* sel, int32_t n_in, int32_t out_col,
    int64_t* positions, int32_t* tgt, uint8_t* ok, uint8_t* ambig,
    int32_t* flag_counts, int64_t* flag_idx, int64_t flag_cap,
    int32_t* nhap_max, int64_t cap,
    int64_t* name_breaks, int64_t max_breaks,
    int64_t* n_breaks_out, int64_t* n_lines_out, int64_t* n_flag_out) {
  int64_t i = 0, line = 0, n_breaks = 0, n_flag = 0;
  const uint8_t* prev_name = nullptr;
  int64_t prev_name_len = -1;
  // column -> ingroup slot (or -1)
  int32_t* slot = new int32_t[(size_t)n_cols];
  for (int32_t c = 0; c < n_cols; ++c) slot[c] = -1;
  for (int32_t k = 0; k < n_in; ++k) slot[sel[k]] = k;
  int32_t* counts = new int32_t[((size_t)n_in + 1) * 4];  // per-pop + outgroup
  #define BAIL(ret) { delete[] slot; delete[] counts; \
    *n_lines_out = line; *n_breaks_out = n_breaks; *n_flag_out = n_flag; \
    return (ret); }
  while (i < len) {
    int64_t line_start = i;
    if (buf[i] == '#') { while (i < len && buf[i] != '\n') ++i; ++i; continue; }
    if (buf[i] == '\n' || buf[i] == '\r') { ++i; continue; }
    if (line >= cap) BAIL(line_start + 1);
    // name
    int64_t name_off = i;
    while (i < len && buf[i] != '\t' && buf[i] != ' ' && buf[i] != '\n') ++i;
    if (i >= len || buf[i] == '\n') BAIL(line_start + 1);
    int64_t name_len = i - name_off;
    ++i;
    if (prev_name_len != name_len ||
        memcmp(buf + name_off, prev_name, (size_t)name_len) != 0) {
      if (n_breaks >= max_breaks) BAIL(-1);
      name_breaks[3 * n_breaks] = line;
      name_breaks[3 * n_breaks + 1] = name_off;
      name_breaks[3 * n_breaks + 2] = name_len;
      ++n_breaks;
      prev_name = buf + name_off;
      prev_name_len = name_len;
    }
    // position
    while (i < len && (buf[i] == '\t' || buf[i] == ' ')) ++i;
    int64_t pos = 0, dstart = i;
    while (i < len && buf[i] >= '0' && buf[i] <= '9') {
      pos = pos * 10 + (buf[i] - '0');
      ++i;
    }
    if (i == dstart || i >= len) BAIL(line_start + 1);
    positions[line] = pos;
    // sample columns
    int64_t total[4] = {0, 0, 0, 0};
    for (int32_t k = 0; k <= n_in; ++k)
      counts[4 * k] = counts[4 * k + 1] = counts[4 * k + 2] = counts[4 * k + 3] = 0;
    for (int32_t c = 0; c < n_cols; ++c) {
      int32_t sl = slot[c];
      bool is_out = (c == out_col);
      for (int v = 0; v < 4; ++v) {
        while (i < len && (buf[i] == '\t' || buf[i] == ' ' ||
                           buf[i] == ',')) ++i;
        if (i >= len || buf[i] == '\n') BAIL(line_start + 1);
        int64_t val = 0, vstart = i;
        while (i < len && buf[i] >= '0' && buf[i] <= '9') {
          val = val * 10 + (buf[i] - '0');
          if (val > 0x7fffffff) BAIL(line_start + 1);
          ++i;
        }
        if (i == vstart) BAIL(line_start + 1);
        if (sl >= 0) { counts[4 * sl + v] = (int32_t)val; total[v] += val; }
        if (is_out) counts[4 * n_in + v] = (int32_t)val;
      }
    }
    while (i < len && buf[i] != '\n') {
      if (buf[i] != '\t' && buf[i] != ' ' && buf[i] != '\r' && buf[i] != ',')
        BAIL(line_start + 1);
      ++i;
    }
    ++i;
    // running per-pop haplotype max (DenseFS dims; matches
    // arrs.sum(axis=2).max(axis=0) over ALL lines)
    for (int32_t k = 0; k < n_in; ++k) {
      int32_t s4 = counts[4*k] + counts[4*k+1] + counts[4*k+2] + counts[4*k+3];
      if (s4 > nhap_max[k]) nhap_max[k] = s4;
    }
    // ---- target selection
    uint8_t line_ok = 0, line_ambig = 0;
    int target = -1;
    if (out_col >= 0) {
      const int32_t* oc = counts + 4 * n_in;
      int n_all = 0, n_out = 0;
      for (int v = 0; v < 4; ++v) {
        bool ia = total[v] > 0, oa = oc[v] > 0;
        if (ia || oa) ++n_all;
        if (oa) ++n_out;
      }
      if (n_all >= 1 && n_all <= 2 && n_out == 1) {
        line_ok = 1;
        for (int v = 0; v < 4; ++v)
          if (total[v] > 0 && oc[v] == 0) { target = v; break; }
        if (target < 0)
          for (int v = 0; v < 4; ++v)
            if (total[v] == 0) { target = v; break; }
        if (target < 0) line_ok = 0;  // unreachable given the gates
      }
    } else {
      int n_all = 0;
      for (int v = 0; v < 4; ++v) if (total[v] > 0) ++n_all;
      if (n_all >= 1 && n_all <= 2) {
        line_ok = 1;
        // argsort()[-2] = element at descending rank 1.  Sort the 4 totals
        // descending by value; ambiguous iff that value ties with a
        // NONZERO neighbour value (zero-total ties all yield identical
        // all-zero per-pop columns, so any choice matches numpy's).
        int64_t d[4] = {total[0], total[1], total[2], total[3]};
        int idx[4] = {0, 1, 2, 3};
        for (int a = 0; a < 3; ++a)
          for (int b = a + 1; b < 4; ++b)
            if (d[b] > d[a]) {
              int64_t tv = d[a]; d[a] = d[b]; d[b] = tv;
              int ti = idx[a]; idx[a] = idx[b]; idx[b] = ti;
            }
        if (d[1] > 0 && (d[0] == d[1] || d[1] == d[2])) {
          line_ambig = 1;
          target = idx[1];             // provisional; caller re-resolves
        } else {
          target = idx[1];
        }
      }
    }
    ok[line] = line_ok;
    ambig[line] = line_ambig;
    if (line_ok && target >= 0) {
      for (int32_t k = 0; k < n_in; ++k)
        tgt[line * (int64_t)n_in + k] = counts[4 * k + target];
    } else {
      for (int32_t k = 0; k < n_in; ++k) tgt[line * (int64_t)n_in + k] = 0;
    }
    if (line_ambig && line_ok) {
      if (n_flag >= flag_cap) BAIL(-2);
      flag_idx[n_flag] = line;
      memcpy(flag_counts + n_flag * ((int64_t)n_in + 1) * 4, counts,
             ((size_t)n_in + 1) * 4 * sizeof(int32_t));
      ++n_flag;
    }
    ++line;
  }
  #undef BAIL
  delete[] slot;
  delete[] counts;
  *n_lines_out = line;
  *n_breaks_out = n_breaks;
  *n_flag_out = n_flag;
  return 0;
}

// Window-CSV emitter for the popgenWindows/ABBABABA finalize stage: one call
// formats a whole flush batch (scaffold,start,end,mid,sites + value columns)
// with the exact reference text semantics (round(np.float64, roundTo) + str;
// "nan" rows for failed windows; int columns via int() truncation).
//
// col_kind: 0 = float (fmt_round_repr), 1 = int-or-nan
// emit    : per-row write mask (failed windows without --writeFailedWindows
//           are skipped by the caller's mask)
// good    : rows with good=0 print "nan" for every stat column
// Returns bytes written, advancing *row_done for the chunked-buffer resume
// protocol, or -3 when a value is out of the exact-format range (|v|>=1e12;
// caller falls back to the Python row loop).
int64_t format_window_csv(
    const uint8_t* scaf_blob, const int64_t* scaf_off, const int64_t* scaf_len,
    const int32_t* scaf_idx,
    const int64_t* start, const int64_t* end_,
    const double* mid, const int64_t* sites,
    const double* values, int32_t n_cols, const uint8_t* col_kind,
    int32_t round_to,
    const uint8_t* emit, const uint8_t* good,
    int64_t n_rows, int64_t start_row,
    uint8_t* out, int64_t out_cap, int64_t* row_done) {
  double scale = 1.0;
  for (int32_t k = 0; k < round_to; ++k) scale *= 10.0;
  int64_t off = 0;
  int64_t r = start_row;
  for (; r < n_rows; ++r) {
    if (!emit[r]) continue;
    int64_t worst = scaf_len[scaf_idx[r]] + 70 + (int64_t)n_cols * 32;
    if (off + worst > out_cap) break;
    int32_t si = scaf_idx[r];
    memcpy(out + off, scaf_blob + scaf_off[si], (size_t)scaf_len[si]);
    off += scaf_len[si];
    out[off++] = ',';
    off += i64toa(start[r], out + off);
    out[off++] = ',';
    off += i64toa(end_[r], out + off);
    out[off++] = ',';
    off += fmt_int_or_nan(mid[r], out + off);
    out[off++] = ',';
    off += i64toa(sites[r], out + off);
    const double* vrow = values + r * (int64_t)n_cols;
    if (!good[r]) {
      for (int32_t c = 0; c < n_cols; ++c) {
        out[off++] = ',';
        out[off++] = 'n'; out[off++] = 'a'; out[off++] = 'n';
      }
    } else {
      for (int32_t c = 0; c < n_cols; ++c) {
        out[off++] = ',';
        double v = vrow[c];
        if (col_kind[c]) {
          off += fmt_int_or_nan(v, out + off);
        } else {
          if (v == v && (v >= 1e12 || v <= -1e12)) { *row_done = r; return -3; }
          int n = fmt_round_repr(v, round_to, scale, out + off);
          if (n < 0) { *row_done = r; return -3; }
          off += n;
        }
      }
    }
    out[off++] = '\n';
  }
  *row_done = r;
  return off;
}

// VCF -> .geno line converter (the parseVCF/parseVCFs hot loop,
// /root/reference/VCF_processing/parseVCF.py:49-190: per-line field split,
// FORMAT/GT extraction, allele-index -> base lookup, ploidy checks, numeric
// genotype filters).  Handles the common fast case and BAILS per line for
// anything unusual (structural surprises, ploidy mismatches that must
// raise); Python re-parses the bail line with the full VcfSite path and
// resumes after it, so semantics are identical line by line.
//
// Grammar: CHROM \t POS \t ID \t REF \t ALT \t QUAL \t FILTER \t INFO \t
//          FORMAT \t S1 .. Sn \n
//
// Options mirror the CLI: min_qual (NaN = off: skip line when QUAL parses
// as float and < min_qual), max_ref_len (0 = off), skip_indels
// (mustMatchREFlen), keep_partial, ploidy_mismatch_to_missing, add_ref
// (REF column), drop_dups (excludeDuplicates: prev CHROM/POS carried across
// chunks), sorted_drop (parseVCFs semantics: also drop POS <= prev within a
// scaffold), numeric gt filters (flag index resolved per line from FORMAT;
// fail -> all-missing genotype, reference parseVCF.py:125-138).
//
// Outputs: geno text rows + scaffold run breaks (line, name_off, name_len,
// out_off) so the caller can drop include/exclude runs by slicing bytes.
// Returns 0 = done; >0 = byte offset+1 of a bail line (consumed/written
// reflect everything before it); -1 = break table full; -5 = output buffer
// full (resume from *consumed_out).
extern "C" int64_t vcf_to_geno_chunk(
    const uint8_t* buf, int64_t len,
    int32_t n_samples, const int32_t* sel, int32_t n_sel,
    const int32_t* ploidy,
    const uint8_t* missing, int64_t missing_len,
    int32_t skip_indels, int32_t keep_partial,
    int32_t ploidy_mismatch_to_missing, int32_t add_ref,
    int32_t drop_dups, int32_t sorted_drop,
    double min_qual, int64_t max_ref_len,
    int32_t n_filt, const uint8_t* filt_flags, const int64_t* filt_flag_len,
    const double* filt_min, const double* filt_max,
    uint8_t out_sep,
    const uint8_t* prev_name, int64_t prev_name_len, int64_t prev_pos_in,
    const uint8_t* out_prev_name, int64_t out_prev_name_len,
    uint8_t* out, int64_t out_cap,
    int64_t* breaks, int64_t max_breaks,
    int64_t* n_breaks_out, int64_t* consumed_out, int64_t* written_out,
    int64_t* prev_pos_out) {
  int64_t i = 0, off = 0, n_breaks = 0;
  const uint8_t* cur_name = prev_name;       // walk scaffold (dup logic)
  int64_t cur_name_len = prev_name_len;
  const uint8_t* owr_name = out_prev_name;   // scaffold of last WRITTEN row
  int64_t owr_name_len = out_prev_name_len;
  int64_t prev_pos = prev_pos_in;
  int64_t line_idx = 0;
  // per-filter offsets into the concatenated filt_flags buffer
  int64_t filt_off[8];
  {
    int64_t acc = 0;
    for (int q = 0; q < n_filt && q < 8; ++q) { filt_off[q] = acc; acc += filt_flag_len[q]; }
  }
  // scratch: allele spans (REF + ALTs), max 64 alleles on the fast path
  const int MAXA = 64;
  const uint8_t* a_ptr[MAXA];
  int64_t a_len[MAXA];
  #define LINE_BAIL() { *n_breaks_out = n_breaks; *consumed_out = line_start; \
    *written_out = off; *prev_pos_out = prev_pos; return line_start + 1; }
  while (i < len) {
    int64_t line_start = i;
    // memchr-based scanning: field splits ride glibc's vectorized memchr
    // (~2x the byte-loop throughput on long sample rows)
    const uint8_t* eol = (const uint8_t*)memchr(buf + i, '\n',
                                                (size_t)(len - i));
    int64_t line_end = eol ? (int64_t)(eol - buf) : len;
    if (buf[i] == '#') { i = line_end + 1; continue; }
    if (i == line_end) { ++i; continue; }
    // locate the 9 fixed fields + sample fields
    const uint8_t* f_ptr[9];
    int64_t f_len[9];
    bool ok_line = true;
    for (int fidx = 0; fidx < 9; ++fidx) {
      const uint8_t* tab = (const uint8_t*)memchr(buf + i, '\t',
                                                  (size_t)(line_end - i));
      if (!tab) { ok_line = false; break; }
      f_ptr[fidx] = buf + i;
      f_len[fidx] = (int64_t)(tab - buf) - i;
      i = (int64_t)(tab - buf) + 1;
    }
    if (!ok_line) LINE_BAIL();
    int64_t samples_start = i;     // first sample field
    // find end of line and sample field offsets
    // (record offsets of all n_samples fields)
    // sample field spans are found lazily below; first find line end
    // POS
    int64_t pos = 0;
    {
      const uint8_t* p = f_ptr[1];
      int64_t n = f_len[1];
      if (n == 0) LINE_BAIL();
      if (n > 1 && p[0] == '0') LINE_BAIL();  // the reference's duplicate
      for (int64_t k = 0; k < n; ++k) {       // check compares POS as text
        if (p[k] < '0' || p[k] > '9') LINE_BAIL();
        pos = pos * 10 + (p[k] - '0');
      }
    }
    // scaffold-run tracking
    bool new_scaf = (cur_name_len != f_len[0] ||
                     cur_name == nullptr ||
                     memcmp(f_ptr[0], cur_name, (size_t)f_len[0]) != 0);
    // duplicate / stale drops need the PREVIOUS position on the SAME
    // scaffold
    if (!new_scaf && prev_pos >= 0) {
      if (drop_dups && pos == prev_pos) {
        i = line_end + 1;
        continue;
      }
      if (sorted_drop && pos <= prev_pos) {
        i = line_end + 1;
        continue;
      }
    }
    // QUAL gate (reference: skip when parseable and < minQual)
    if (min_qual == min_qual) {
      char tmp[64];
      int64_t n = f_len[5] < 63 ? f_len[5] : 63;
      memcpy(tmp, f_ptr[5], (size_t)n);
      tmp[n] = 0;
      char* endp = nullptr;
      double q = strtod(tmp, &endp);
      if (endp == tmp + n && n > 0 && q < min_qual) {
        i = line_end + 1;
        // a dropped line still advances the walk (duplicate suppression
        // happens before the QUAL gate in the reference)
        if (new_scaf) { cur_name = f_ptr[0]; cur_name_len = f_len[0]; }
        prev_pos = pos;
        continue;
      }
    }
    // REF length gates
    int64_t ref_len = f_len[3];
    if (max_ref_len && ref_len > max_ref_len) {
      i = line_end + 1;
      if (new_scaf) { cur_name = f_ptr[0]; cur_name_len = f_len[0]; }
      prev_pos = pos;
      continue;
    }
    // alleles: REF + comma-split ALT ('.' => none)
    int n_all = 0;
    a_ptr[n_all] = f_ptr[3]; a_len[n_all] = ref_len; ++n_all;
    if (!(f_len[4] == 1 && f_ptr[4][0] == '.')) {
      const uint8_t* p = f_ptr[4];
      int64_t n = f_len[4];
      int64_t s0 = 0;
      for (int64_t k = 0; k <= n; ++k) {
        if (k == n || p[k] == ',') {
          if (n_all >= MAXA) LINE_BAIL();
          a_ptr[n_all] = p + s0;
          a_len[n_all] = k - s0;
          ++n_all;
          s0 = k + 1;
        }
      }
    }
    // FORMAT: GT index + filter flag indices
    int gt_idx = -1;
    int filt_idx[8];
    for (int k = 0; k < n_filt; ++k) filt_idx[k] = -1;
    {
      const uint8_t* p = f_ptr[8];
      int64_t n = f_len[8];
      int fld = 0;
      int64_t s0 = 0;
      for (int64_t k = 0; k <= n; ++k) {
        if (k == n || p[k] == ':') {
          int64_t L = k - s0;
          if (L == 2 && p[s0] == 'G' && p[s0 + 1] == 'T' && gt_idx < 0)
            gt_idx = fld;
          for (int q = 0; q < n_filt; ++q)
            if (filt_idx[q] < 0 && L == filt_flag_len[q] &&
                memcmp(p + s0, filt_flags + filt_off[q], (size_t)L) == 0)
              filt_idx[q] = fld;
          ++fld;
          s0 = k + 1;
        }
      }
    }
    if (gt_idx < 0) LINE_BAIL();
    // walk sample fields, remembering spans of the SELECTED ones
    const uint8_t* s_ptr_all[1024];
    int64_t s_len_all[1024];
    if (n_samples > 1024) LINE_BAIL();
    {
      int64_t p = i;
      int32_t fld = 0;
      while (fld < n_samples - 1) {
        const uint8_t* tab = (const uint8_t*)memchr(buf + p, '\t',
                                                    (size_t)(line_end - p));
        if (!tab) break;
        s_ptr_all[fld] = buf + p;
        s_len_all[fld] = (int64_t)(tab - buf) - p;
        p = (int64_t)(tab - buf) + 1;
        ++fld;
      }
      if (fld != n_samples - 1) LINE_BAIL();
      if (memchr(buf + p, '\t', (size_t)(line_end - p)) != nullptr)
        LINE_BAIL();                      // extra fields: count mismatch
      s_ptr_all[fld] = buf + p;
      s_len_all[fld] = line_end - p;
    }
    i = line_end + 1;
    (void)samples_start;
    // capacity check (worst case: per sample ploidy * (max allele len) +
    // separators)
    int64_t max_alen = 0;
    for (int a = 0; a < n_all; ++a)
      if (a_len[a] > max_alen) max_alen = a_len[a];
    if (max_alen < missing_len) max_alen = missing_len;
    int64_t worst = f_len[0] + 24 + (add_ref ? ref_len + 1 : 0);
    for (int32_t j = 0; j < n_sel; ++j)
      worst += 1 + (int64_t)ploidy[j] * (max_alen + 1);
    if (off + worst > out_cap) {
      *n_breaks_out = n_breaks; *consumed_out = line_start;
      *written_out = off; *prev_pos_out = prev_pos;
      return -5;
    }
    // ---- emit the row into a tentative region (rolled back on bail)
    int64_t row_start = off;
    memcpy(out + off, f_ptr[0], (size_t)f_len[0]); off += f_len[0];
    out[off++] = out_sep;
    memcpy(out + off, f_ptr[1], (size_t)f_len[1]); off += f_len[1];
    if (add_ref) {
      out[off++] = out_sep;
      memcpy(out + off, f_ptr[3], (size_t)ref_len); off += ref_len;
    }
    bool bail = false;
    for (int32_t j = 0; j < n_sel && !bail; ++j) {
      const uint8_t* sf = s_ptr_all[sel[j]];
      int64_t sn = s_len_all[sel[j]];
      // subfield spans within the sample field
      const uint8_t* gt_p = nullptr;
      int64_t gt_n = 0;
      const uint8_t* fv_p[8];
      int64_t fv_n[8];
      for (int q = 0; q < n_filt; ++q) { fv_p[q] = nullptr; fv_n[q] = 0; }
      {
        int fld = 0;
        int64_t s0 = 0;
        for (int64_t k = 0; k <= sn; ++k) {
          if (k == sn || sf[k] == ':') {
            if (fld == gt_idx) { gt_p = sf + s0; gt_n = k - s0; }
            for (int q = 0; q < n_filt; ++q)
              if (filt_idx[q] == fld) { fv_p[q] = sf + s0; fv_n[q] = k - s0; }
            ++fld;
            s0 = k + 1;
          }
        }
      }
      if (gt_p == nullptr) { bail = true; break; }   // GT column absent
      // numeric filters -> passed
      bool passed = true;
      for (int q = 0; q < n_filt && passed; ++q) {
        if (filt_idx[q] < 0 || fv_p[q] == nullptr) { passed = false; break; }
        // comma-separated floats, all must be within [min, max]
        char tmp[64];
        int64_t s0 = 0;
        const uint8_t* p = fv_p[q];
        int64_t n = fv_n[q];
        if (n == 0) { passed = false; break; }
        for (int64_t k = 0; k <= n && passed; ++k) {
          if (k == n || p[k] == ',') {
            int64_t L = k - s0;
            if (L <= 0 || L > 63) { passed = false; break; }
            memcpy(tmp, p + s0, (size_t)L);
            tmp[L] = 0;
            char* endp = nullptr;
            double v = strtod(tmp, &endp);
            if (endp != tmp + L) { passed = false; break; }
            if (!(filt_min[q] <= v) || !(v <= filt_max[q]))
              passed = false;
            s0 = k + 1;
          }
        }
      }
      // GT alleles: indices split on / or |
      int idxs[16];
      int n_al = 0;
      char phase = '/';
      {
        int64_t s0 = 0;
        for (int64_t k = 0; k <= gt_n; ++k) {
          if (k == gt_n || gt_p[k] == '/' || gt_p[k] == '|') {
            if (k < gt_n && gt_p[k] == '|') phase = '|';
            int64_t L = k - s0;
            if (n_al >= 16) { bail = true; break; }
            if (L == 1 && gt_p[s0] == '.') {
              idxs[n_al++] = -1;                      // '.' allele
            } else if (L >= 1) {
              int v = 0;
              bool num = true;
              for (int64_t t = s0; t < k; ++t) {
                if (gt_p[t] < '0' || gt_p[t] > '9') { num = false; break; }
                v = v * 10 + (gt_p[t] - '0');
              }
              if (!num) { bail = true; break; }
              idxs[n_al++] = v;
            } else {
              bail = true; break;                     // empty allele token
            }
            s0 = k + 1;
          }
        }
      }
      if (bail) break;
      int32_t want = ploidy[j];
      if (n_al != want) {
        if (ploidy_mismatch_to_missing) passed = false;
        else { bail = true; break; }                  // reference raises
      }
      out[off++] = out_sep;
      if (!passed) {
        for (int32_t a = 0; a < want; ++a) {
          if (a) out[off++] = phase;
          memcpy(out + off, missing, (size_t)missing_len);
          off += missing_len;
        }
        continue;
      }
      // resolve allele strings; any failure -> all missing (reference's
      // except -> [missing]*ploidy, parseVCF.py:150-160)
      bool any_missing = false;
      const uint8_t* r_ptr[16];
      int64_t r_len[16];
      bool all_fail = false;
      for (int a = 0; a < n_al; ++a) {
        int v = idxs[a];
        if (v < 0 || v >= n_all) { all_fail = true; break; }  // KeyError path
        if (skip_indels && a_len[v] != ref_len) {
          r_ptr[a] = missing; r_len[a] = missing_len;
          any_missing = true;
        } else {
          r_ptr[a] = a_ptr[v]; r_len[a] = a_len[v];
          if (a_len[v] == missing_len &&
              memcmp(a_ptr[v], missing, (size_t)missing_len) == 0)
            any_missing = true;       // an allele EQUAL to the missing text
        }
      }
      if (all_fail || (!keep_partial && any_missing)) {
        for (int32_t a = 0; a < want; ++a) {
          if (a) out[off++] = phase;
          memcpy(out + off, missing, (size_t)missing_len);
          off += missing_len;
        }
        continue;
      }
      for (int a = 0; a < n_al; ++a) {
        if (a) out[off++] = phase;
        memcpy(out + off, r_ptr[a], (size_t)r_len[a]);
        off += r_len[a];
      }
    }
    if (bail) {
      off = row_start;                                // roll back the row
      LINE_BAIL();
    }
    out[off++] = '\n';
    // run break: scaffold of this WRITTEN row differs from the last one
    if (owr_name_len != f_len[0] || owr_name == nullptr ||
        memcmp(f_ptr[0], owr_name, (size_t)f_len[0]) != 0) {
      if (n_breaks >= max_breaks) {
        *n_breaks_out = n_breaks; *consumed_out = line_start;
        *written_out = row_start; *prev_pos_out = prev_pos;
        return -1;
      }
      breaks[4 * n_breaks] = line_idx;
      breaks[4 * n_breaks + 1] = f_ptr[0] - buf;
      breaks[4 * n_breaks + 2] = f_len[0];
      breaks[4 * n_breaks + 3] = row_start;
      ++n_breaks;
      owr_name = f_ptr[0];
      owr_name_len = f_len[0];
    }
    if (new_scaf) {
      cur_name = f_ptr[0];
      cur_name_len = f_len[0];
    }
    prev_pos = pos;
    ++line_idx;
  }
  #undef LINE_BAIL
  *n_breaks_out = n_breaks;
  *consumed_out = len;
  *written_out = off;
  *prev_pos_out = prev_pos;
  return 0;
}

}  // extern "C"

extern "C" {

// Whole-buffer gzip decompression via libdeflate (2-3x faster than zlib).
// Handles multi-member gzip streams.  Returns total decompressed bytes, or
// -1 (output too small) / -2 (corrupt) / -3 (not built with libdeflate).
int64_t gzip_decompress(const uint8_t* in, int64_t in_len,
                        uint8_t* out, int64_t out_cap) {
#ifdef HAVE_LIBDEFLATE
  struct libdeflate_decompressor* d = libdeflate_alloc_decompressor();
  int64_t in_off = 0, out_off = 0;
  while (in_off < in_len) {
    size_t in_used = 0, out_used = 0;
    enum libdeflate_result r = libdeflate_gzip_decompress_ex(
        d, in + in_off, (size_t)(in_len - in_off),
        out + out_off, (size_t)(out_cap - out_off), &in_used, &out_used);
    if (r == LIBDEFLATE_INSUFFICIENT_SPACE) {
      libdeflate_free_decompressor(d);
      return -1;
    }
    if (r != LIBDEFLATE_SUCCESS) {
      libdeflate_free_decompressor(d);
      return -2;
    }
    in_off += (int64_t)in_used;
    out_off += (int64_t)out_used;
    if (in_used == 0) break;
  }
  libdeflate_free_decompressor(d);
  return out_off;
#else
  (void)in; (void)in_len; (void)out; (void)out_cap;
  return -3;
#endif
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Streaming gzip chunker: serves line-aligned decompressed chunks without
// ever materializing the whole file.
//
// On a 2-core host with fluctuating memory bandwidth the whole-file
// decompress (189 MB text materialized, then re-read by the tokenizer) is
// the dominant cost of a popgenWindows sweep; this session decompresses into
// caller-supplied chunk-sized buffers that stay cache-warm for the tokenizer
// that runs immediately after.
//
// Two decode modes, chosen per gzip member:
//   * member fits the chunk buffer (multi-member / bgzf-style files, the
//     common case for tabix-able .geno.gz): one-shot libdeflate per member —
//     ~3x faster than zlib inflate;
//   * member larger than the buffer (classic single-member gzip): fall back
//     to zlib streaming for that member.
// A partial trailing line is carried across calls so every returned chunk
// ends at a newline (append-\n-at-EOF matches the Python reader).

namespace {
constexpr int64_t TAIL_CAP = 1 << 20;
}

struct GzStream {
  const uint8_t* gz;      // borrowed; caller keeps the bytes alive
  int64_t gz_len, gz_off;
  int z_active;           // mid-member zlib streaming in progress
  int z_giveup;           // stop trying libdeflate (oversized members)
#ifdef HAVE_ZLIB
  z_stream zs;
#endif
#ifdef HAVE_LIBDEFLATE
  struct libdeflate_decompressor* dd;
#endif
  uint8_t tail[TAIL_CAP];
  int64_t tail_len;
};

extern "C" {

void* gz_stream_open(const uint8_t* gz, int64_t gz_len) {
#if defined(HAVE_ZLIB)
  GzStream* s = new GzStream();
  s->gz = gz;
  s->gz_len = gz_len;
  s->gz_off = 0;
  s->z_active = 0;
  s->z_giveup = 0;
  s->tail_len = 0;
#ifdef HAVE_LIBDEFLATE
  s->dd = libdeflate_alloc_decompressor();
#endif
  return s;
#else
  (void)gz; (void)gz_len;
  return nullptr;
#endif
}

void gz_stream_close(void* p) {
#ifdef HAVE_ZLIB
  GzStream* s = (GzStream*)p;
  if (!s) return;
  if (s->z_active) inflateEnd(&s->zs);
#ifdef HAVE_LIBDEFLATE
  if (s->dd) libdeflate_free_decompressor(s->dd);
#endif
  delete s;
#endif
}

// Fill out[0..cap) with decompressed bytes ending at a line boundary.
// Returns n > 0 bytes, 0 on clean EOF, -2 on corrupt input, -4 when a single
// line exceeds the tail capacity (1 MB).
int64_t gz_stream_next(void* p, uint8_t* out, int64_t cap) {
#ifndef HAVE_ZLIB
  (void)p; (void)out; (void)cap;
  return -2;
#else
  GzStream* s = (GzStream*)p;
  int64_t off = s->tail_len;
  if (off) memcpy(out, s->tail, (size_t)off);
  s->tail_len = 0;
  const int64_t start = off;

  while (off < cap && (s->gz_off < s->gz_len || s->z_active)) {
    if (!s->z_active) {
#ifdef HAVE_LIBDEFLATE
      if (!s->z_giveup && s->dd) {
        size_t in_used = 0, out_used = 0;
        enum libdeflate_result r = libdeflate_gzip_decompress_ex(
            s->dd, s->gz + s->gz_off, (size_t)(s->gz_len - s->gz_off),
            out + off, (size_t)(cap - off), &in_used, &out_used);
        if (r == LIBDEFLATE_SUCCESS) {
          if (in_used == 0) { s->gz_off = s->gz_len; break; }
          s->gz_off += (int64_t)in_used;
          off += (int64_t)out_used;
          continue;
        }
        if (r == LIBDEFLATE_INSUFFICIENT_SPACE) {
          // progress was made this call: return the chunk and retry the
          // member with a near-empty buffer next call; otherwise the member
          // cannot fit the buffer at all -- stream it with zlib instead
          if (off > start) break;
          s->z_giveup = 1;
        } else {
          return -2;
        }
      }
#endif
      memset(&s->zs, 0, sizeof(s->zs));
      if (inflateInit2(&s->zs, 31) != Z_OK) return -2;
      s->z_active = 1;
    }
    // zlib streaming: avail_* are 32-bit, so clamp per call
    uInt in_avail = (uInt)((s->gz_len - s->gz_off) > 0x40000000
                           ? 0x40000000 : (s->gz_len - s->gz_off));
    s->zs.next_in = (Bytef*)(s->gz + s->gz_off);
    s->zs.avail_in = in_avail;
    s->zs.next_out = out + off;
    s->zs.avail_out = (uInt)((cap - off) > 0x40000000 ? 0x40000000
                             : (cap - off));
    int zr = inflate(&s->zs, Z_NO_FLUSH);
    s->gz_off += (int64_t)(in_avail - s->zs.avail_in);
    off = (int64_t)(s->zs.next_out - out);
    if (zr == Z_STREAM_END) {
      inflateEnd(&s->zs);
      s->z_active = 0;       // next member may try libdeflate again
      s->z_giveup = 0;
    } else if (zr != Z_OK && zr != Z_BUF_ERROR) {
      return -2;
    } else if (s->zs.avail_out != 0 && s->gz_off >= s->gz_len) {
      // input exhausted mid-member: truncated stream
      inflateEnd(&s->zs);
      s->z_active = 0;
      break;
    } else if (zr == Z_BUF_ERROR && s->zs.avail_out != 0) {
      break;                 // no progress possible this call
    }
  }

  if (off == 0) return 0;

  // cut at the last newline; carry the remainder
  int64_t nl = off - 1;
  while (nl >= 0 && out[nl] != '\n') --nl;
  bool eof = s->gz_off >= s->gz_len && !s->z_active;
  if (nl < 0) {
    if (eof) {                     // final line without trailing newline
      if (off < cap) { out[off++] = '\n'; return off; }
      return -4;
    }
    if (off > TAIL_CAP || off >= cap) return -4;  // one line exceeds cap
    memcpy(s->tail, out, (size_t)off);
    s->tail_len = off;
    return gz_stream_next(p, out, cap);
  }
  int64_t keep = off - (nl + 1);
  if (keep > TAIL_CAP) return -4;
  if (keep) memcpy(s->tail, out + nl + 1, (size_t)keep);
  s->tail_len = keep;
  return nl + 1;
#endif
}

// ---- wire v3: class-partitioned pair planes ------------------------------
//
// The pairwise mismatch/shared kernel only needs per-site per-haplotype
// information for sites that can produce a nonzero mismatch or a nonuniform
// shared contribution.  Classifying sites lets most of the wire bytes stay
// on the host (real cohorts are overwhelmingly monomorphic):
//
//   class 1 (A): one called allele, no missing  -> shared += 1 for every
//                pair; a per-window COUNT suffices, zero wire bits
//   class 2 (B): one called allele (or none... see 0), some missing
//                -> shared needs the 1-bit called plane; mismatch = 0
//   class 3 (C): two called alleles, no missing -> mismatch needs the 1-bit
//                alt plane; shared += 1 per pair (counted with A)
//   class 4 (D): two called alleles, some missing -> both planes (2 bits)
//   class 0    : no called alleles -> contributes nothing, dropped
//   class 5    : >2 called alleles -> exception, raw codes shipped
//
// classify_pair_sites: one pass filling cls[u8 S], refalt[u8 S] (ref |
// alt<<2), ex_idx[i32] and counts[5] = {nA, nB, nC, nD, nAC} (nAC =
// nA + nC, the per-pair constant-shared site count).  Returns n_ex or -1
// when max_ex is exceeded.
int64_t classify_pair_sites(
    const int8_t* alleles, int64_t n_rows, int64_t row_stride,
    int64_t n_sites, uint8_t* cls, uint8_t* refalt,
    int32_t* ex_idx, int64_t max_ex, int64_t* counts) {
  uint8_t* seen = new uint8_t[(size_t)n_sites]();
  uint8_t* anymiss = new uint8_t[(size_t)n_sites]();
  for (int64_t h = 0; h < n_rows; ++h) {
    const int8_t* row = alleles + h * row_stride;
    for (int64_t s = 0; s < n_sites; ++s) {
      int8_t c = row[s];
      seen[s] |= (c >= 0) ? (uint8_t)(1u << c) : 0u;
      anymiss[s] |= (uint8_t)(c < 0);
    }
  }
  int64_t n_ex = 0, nA = 0, nB = 0, nC = 0, nD = 0;
  for (int64_t s = 0; s < n_sites; ++s) {
    uint8_t m = seen[s];
    int pc = __builtin_popcount(m);
    if (pc > 2) {
      if (n_ex >= max_ex) { delete[] seen; delete[] anymiss; return -1; }
      ex_idx[n_ex++] = (int32_t)s;
      cls[s] = 5;
      refalt[s] = 0;
      continue;
    }
    if (m == 0) { cls[s] = 0; refalt[s] = 0; continue; }
    int ref = __builtin_ctz(m);
    int a = 31 - __builtin_clz((unsigned)m);
    refalt[s] = (uint8_t)(ref | (a << 2));
    if (pc == 1) {
      if (anymiss[s]) { cls[s] = 2; ++nB; }
      else            { cls[s] = 1; ++nA; }
    } else {
      if (anymiss[s]) { cls[s] = 4; ++nD; }
      else            { cls[s] = 3; ++nC; }
    }
  }
  counts[0] = nA; counts[1] = nB; counts[2] = nC; counts[3] = nD;
  counts[4] = nA + nC;
  delete[] seen;
  delete[] anymiss;
  return n_ex;
}

// emit_class_planes: write the compacted per-class bit planes.  Plane
// buffers are caller-allocated (row-major [n_rows, sp*8]) and fully
// overwritten (pad bits = 0).  calledB gets class-2 called bits, altC
// class-3 alt bits, calledD/altD class-4 bits; compaction preserves site
// order, so a contiguous window span maps to a contiguous range per class.
//
// The per-class site index lists are built once (the only data-dependent
// branches), then every row packs branchlessly via 8-wide gathers — a
// per-site switch in the row loop costs ~6x more in branch mispredicts.
void emit_class_planes(
    const int8_t* alleles, int64_t n_rows, int64_t row_stride,
    int64_t n_sites, const uint8_t* cls, const uint8_t* refalt,
    uint8_t* calledB, int64_t spB8,
    uint8_t* altC, int64_t spC8,
    uint8_t* calledD, uint8_t* altD, int64_t spD8) {
  int64_t nB = 0, nC = 0, nD = 0;
  for (int64_t s = 0; s < n_sites; ++s) {
    nB += (cls[s] == 2);
    nC += (cls[s] == 3);
    nD += (cls[s] == 4);
  }
  int32_t* idxB = new int32_t[(size_t)(nB + 8)];
  int32_t* idxC = new int32_t[(size_t)(nC + 8)];
  int32_t* idxD = new int32_t[(size_t)(nD + 8)];
  int8_t* altcC = new int8_t[(size_t)(nC + 8)];
  int8_t* altcD = new int8_t[(size_t)(nD + 8)];
  int64_t iB = 0, iC = 0, iD = 0;
  for (int64_t s = 0; s < n_sites; ++s) {
    uint8_t k = cls[s];
    if (k == 2) idxB[iB++] = (int32_t)s;
    else if (k == 3) { altcC[iC] = (int8_t)(refalt[s] >> 2); idxC[iC++] = (int32_t)s; }
    else if (k == 4) { altcD[iD] = (int8_t)(refalt[s] >> 2); idxD[iD++] = (int32_t)s; }
  }
  // pad tails so the 8-wide inner loops never read past a list (site 0 with
  // an impossible alt code yields a 0 bit in every plane variant below only
  // for the *alt* planes; called bits are masked by the byte cut instead)
  for (int k = 0; k < 8; ++k) {
    idxB[nB + k] = 0; idxC[nC + k] = 0; idxD[nD + k] = 0;
    altcC[nC + k] = -2; altcD[nD + k] = -2;
  }
  memset(calledB, 0, (size_t)(n_rows * spB8));
  memset(altC, 0, (size_t)(n_rows * spC8));
  memset(calledD, 0, (size_t)(n_rows * spD8));
  memset(altD, 0, (size_t)(n_rows * spD8));
  int64_t bB = (nB + 7) / 8, bC = (nC + 7) / 8, bD = (nD + 7) / 8;
  uint8_t lastmB = (uint8_t)(0xFFu >> ((8 - (nB & 7)) & 7));
  uint8_t lastmC = (uint8_t)(0xFFu >> ((8 - (nC & 7)) & 7));
  uint8_t lastmD = (uint8_t)(0xFFu >> ((8 - (nD & 7)) & 7));
  if ((nB & 7) == 0) lastmB = 0xFF;
  if ((nC & 7) == 0) lastmC = 0xFF;
  if ((nD & 7) == 0) lastmD = 0xFF;
  for (int64_t h = 0; h < n_rows; ++h) {
    const int8_t* row = alleles + h * row_stride;
    uint8_t* rB = calledB + h * spB8;
    for (int64_t b = 0; b < bB; ++b) {
      const int32_t* p = idxB + 8 * b;
      uint8_t v = 0;
      for (int k = 0; k < 8; ++k)
        v |= (uint8_t)((row[p[k]] >= 0) << k);
      rB[b] = v;
    }
    if (bB) rB[bB - 1] &= lastmB;
    uint8_t* rC = altC + h * spC8;
    for (int64_t b = 0; b < bC; ++b) {
      const int32_t* p = idxC + 8 * b;
      const int8_t* ac = altcC + 8 * b;
      uint8_t v = 0;
      for (int k = 0; k < 8; ++k)
        v |= (uint8_t)((row[p[k]] == ac[k]) << k);
      rC[b] = v;
    }
    uint8_t* rDc = calledD + h * spD8;
    uint8_t* rDa = altD + h * spD8;
    for (int64_t b = 0; b < bD; ++b) {
      const int32_t* p = idxD + 8 * b;
      const int8_t* ac = altcD + 8 * b;
      uint8_t vc = 0, va = 0;
      for (int k = 0; k < 8; ++k) {
        int8_t c = row[p[k]];
        uint8_t ok = (uint8_t)(c >= 0);
        vc |= (uint8_t)(ok << k);
        va |= (uint8_t)((ok & (c == ac[k])) << k);
      }
      rDc[b] = vc;
      rDa[b] = va;
    }
    if (bD) { rDc[bD - 1] &= lastmD; rDa[bD - 1] &= lastmD; }
  }
  delete[] idxB; delete[] idxC; delete[] idxD;
  delete[] altcC; delete[] altcD;
}

// site_pop_counts_host: per-site per-mask allele counts on the host CPU —
// the counts stage of the ABBA/f4 host executor (and any other counts
// consumer with small cohorts).  membership: uint8 [n_rows] bitmask of the
// (<= 8) masks each row belongs to (masks may overlap, e.g. pops + their
// union).  counts: out uint16 [n_sites, n_masks, 4], zeroed here.
void site_pop_counts_host(
    const int8_t* alleles, int64_t n_rows, int64_t row_stride,
    int64_t n_sites, const uint8_t* membership, int32_t n_masks,
    uint16_t* counts) {
  memset(counts, 0, (size_t)(n_sites * n_masks * 4) * 2);
  for (int64_t h = 0; h < n_rows; ++h) {
    uint8_t m = membership[h];
    if (!m) continue;
    const int8_t* row = alleles + h * row_stride;
    for (int64_t s = 0; s < n_sites; ++s) {
      int8_t c = row[s];
      if (c < 0) continue;
      uint16_t* base = counts + (size_t)(s * n_masks) * 4 + c;
      uint8_t mm = m;
      while (mm) {
        int p = __builtin_ctz(mm);
        mm &= (uint8_t)(mm - 1);
        base[4 * p] += 1;
      }
    }
  }
}

// pairwise_window_counts: per-window pairwise mismatch/shared counts over
// the v2 bit planes (called/alt from pack_pair_planes), on the host CPU.
//
// This is the small-cohort executor of the pairwise kernel: with H
// haplotypes there are only H(H-1)/2 pairs, and word-parallel
// AND/XOR/popcount over the planes computes a flush in single-digit
// milliseconds — faster than any device round trip when H is small (the
// MXU path wins once H^2 work dominates; kernels/pairdist picks per the
// cost model).  Exception (multi-allelic) sites are cleared in the planes
// and patched by the caller exactly as on the device path, so the
// integers are identical.
//
// called/alt : uint8 [H, sp8] little-endian site bits, sp8 % 8 == 0
// first/n    : window spans (site indices); m_out/s_out int32 [W, H, H]
void pairwise_window_counts(
    const uint8_t* called, const uint8_t* alt, int64_t sp8, int64_t H,
    const int64_t* first, const int64_t* n_sites, int64_t W,
    int32_t* m_out, int32_t* s_out) {
  int64_t nw = sp8 / 8;
  const uint64_t* Cw = (const uint64_t*)called;
  const uint64_t* Aw = (const uint64_t*)alt;
  memset(m_out, 0, (size_t)(W * H * H) * 4);
  memset(s_out, 0, (size_t)(W * H * H) * 4);
  for (int64_t w = 0; w < W; ++w) {
    int64_t f = first[w], n = n_sites[w];
    if (n <= 0) continue;
    int64_t w0 = f >> 6, w1 = (f + n - 1) >> 6;
    uint64_t mask0 = ~0ULL << (f & 63);
    uint64_t mask1 = ~0ULL >> (63 - ((f + n - 1) & 63));
    if (w0 == w1) mask0 &= mask1;
    int32_t* mw = m_out + w * H * H;
    int32_t* sw = s_out + w * H * H;
    for (int64_t i = 0; i < H; ++i) {
      const uint64_t* ci = Cw + i * nw;
      const uint64_t* ai = Aw + i * nw;
      for (int64_t j = 0; j <= i; ++j) {
        const uint64_t* cj = Cw + j * nw;
        const uint64_t* aj = Aw + j * nw;
        int64_t s = 0, m = 0;
        uint64_t both = ci[w0] & cj[w0] & mask0;
        s += __builtin_popcountll(both);
        m += __builtin_popcountll((ai[w0] ^ aj[w0]) & both);
        for (int64_t k = w0 + 1; k < w1; ++k) {
          both = ci[k] & cj[k];
          s += __builtin_popcountll(both);
          m += __builtin_popcountll((ai[k] ^ aj[k]) & both);
        }
        if (w1 > w0) {
          both = ci[w1] & cj[w1] & mask1;
          s += __builtin_popcountll(both);
          m += __builtin_popcountll((ai[w1] ^ aj[w1]) & both);
        }
        mw[i * H + j] = mw[j * H + i] = (int32_t)m;
        sw[i * H + j] = sw[j * H + i] = (int32_t)s;
      }
    }
  }
}

// merge_geno_blocks: k-way positional merge of converted .geno row blocks
// (one scaffold; the parseVCFs multi-file union/intersect merge,
// /root/reference/VCF_processing/parseVCFs.py:60-87 — but over rows the C
// VCF converter already produced, not raw VCF lines).
//
// Each input block holds rows "SCAF<sep>POS<sep>COLS\n" with strictly
// increasing POS (the converter's sorted-drop mode guarantees it).  For
// every position <= limit_pos present in >= 1 (union) or == n_files
// (intersect) blocks, emits "SCAF<sep>POS<sep>" + per-file COLS (or that
// file's missing fill) joined by sep.  Rows with POS > max_pos are
// consumed but not emitted (the reference walk never visits positions
// past the declared scaffold length).
//
// bufs/lens   : per-file row data (only rows with POS <= limit_pos are
//               consumed; consumed[] reports bytes eaten per file)
// miss/miss_len: per-file missing-fill column text
// Returns bytes written to out, or -1 when out is full (caller grows out
// and retries with the same inputs; consumed[] is only valid on success).
int64_t merge_geno_blocks(
    int32_t n_files, const uint8_t** bufs, const int64_t* lens,
    uint8_t sep, int64_t limit_pos, int64_t max_pos, int32_t intersect,
    const uint8_t** miss, const int64_t* miss_len,
    uint8_t* out, int64_t out_cap, int64_t* consumed) {
  enum { MAXK = 64 };
  if (n_files > MAXK) return -2;
  int64_t pos_[MAXK];         // current head position (INT64_MAX = done)
  int64_t head_[MAXK];        // byte offset of current row
  int64_t cols_[MAXK];        // offset of COLS within current row
  int64_t end_[MAXK];         // offset one past current row's '\n'
  int64_t ptext_off[MAXK], ptext_len[MAXK];

  auto parse_head = [&](int x) {
    const uint8_t* b = bufs[x];
    int64_t i = head_[x];
    if (i >= lens[x]) { pos_[x] = INT64_MAX; return; }
    // SCAF field
    while (i < lens[x] && b[i] != sep) ++i;
    ++i;
    int64_t p0 = i;
    int64_t p = 0;
    while (i < lens[x] && b[i] >= '0' && b[i] <= '9') {
      p = p * 10 + (b[i] - '0');
      ++i;
    }
    ptext_off[x] = p0; ptext_len[x] = i - p0;
    ++i;                                    // the sep after POS
    cols_[x] = i;
    while (i < lens[x] && b[i] != '\n') ++i;
    end_[x] = i + 1;
    pos_[x] = p;
  };
  for (int x = 0; x < n_files; ++x) { head_[x] = 0; parse_head(x); }

  int64_t off = 0;
  for (;;) {
    int64_t p = INT64_MAX;
    for (int x = 0; x < n_files; ++x)
      if (pos_[x] < p) p = pos_[x];
    if (p == INT64_MAX || p > limit_pos) break;
    int present = 0, firstx = -1;
    for (int x = 0; x < n_files; ++x)
      if (pos_[x] == p) { ++present; if (firstx < 0) firstx = x; }
    bool emit = (p <= max_pos) &&
                (intersect ? (present == n_files) : (present >= 1));
    if (emit) {
      // worst-case row size check
      const uint8_t* fb = bufs[firstx];
      int64_t scaf_len = 0;
      while (fb[head_[firstx] + scaf_len] != sep) ++scaf_len;
      int64_t need = scaf_len + 1 + ptext_len[firstx] + 1 + 1;
      for (int x = 0; x < n_files; ++x)
        need += 1 + ((pos_[x] == p) ? (end_[x] - 1 - cols_[x]) : miss_len[x]);
      if (off + need > out_cap) return -1;
      memcpy(out + off, fb + head_[firstx], (size_t)scaf_len);
      off += scaf_len;
      out[off++] = sep;
      memcpy(out + off, fb + ptext_off[firstx], (size_t)ptext_len[firstx]);
      off += ptext_len[firstx];
      for (int x = 0; x < n_files; ++x) {
        out[off++] = sep;
        if (pos_[x] == p) {
          int64_t n = end_[x] - 1 - cols_[x];
          memcpy(out + off, bufs[x] + cols_[x], (size_t)n);
          off += n;
        } else {
          memcpy(out + off, miss[x], (size_t)miss_len[x]);
          off += miss_len[x];
        }
      }
      out[off++] = '\n';
    }
    for (int x = 0; x < n_files; ++x)
      if (pos_[x] == p) { head_[x] = end_[x]; parse_head(x); }
  }
  for (int x = 0; x < n_files; ++x) consumed[x] = head_[x];
  return off;
}

// class_prefix_sums: exclusive prefix sums of the class indicator vectors,
// used by the host to map window spans to compacted class ranges.  cum is
// int64 [4, n_sites + 1]: rows = class B (2), C (3), D (4), and AC
// (classes 1 or 3, the constant-shared count).
void class_prefix_sums(const uint8_t* cls, int64_t n_sites, int64_t* cum) {
  int64_t* cB = cum;
  int64_t* cC = cum + (n_sites + 1);
  int64_t* cD = cum + 2 * (n_sites + 1);
  int64_t* cAC = cum + 3 * (n_sites + 1);
  int64_t b = 0, c = 0, d = 0, ac = 0;
  cB[0] = cC[0] = cD[0] = cAC[0] = 0;
  for (int64_t s = 0; s < n_sites; ++s) {
    uint8_t k = cls[s];
    b += (k == 2); c += (k == 3); d += (k == 4);
    ac += (k == 1) | (k == 3);
    cB[s + 1] = b; cC[s + 1] = c; cD[s + 1] = d; cAC[s + 1] = ac;
  }
}

}  // extern "C"
