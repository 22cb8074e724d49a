// Native high-precision reference-orbit walker for fractal_tpu.
//
// The deep-zoom render path (fractal_tpu/ops/perturb.py::reference_orbit)
// walks the reference pixel's orbit on the host in mpmath arbitrary-
// precision arithmetic; at 20k iterations x ~60-digit precision the pure-
// Python walk costs minutes and dominates every cold deep frame.  This
// library replicates mpmath's arithmetic BIT-FOR-BIT in C++ (so cached
// orbits, pinned tests and bit-equality contracts are unchanged) and runs
// the whole loop natively — typically >1000x faster.
//
// Bit-compatibility contract (mirrors mpmath 1.x, BACKEND == 'python'):
//  * mpf raw tuples (sign, man, exp, bc) with canonical odd mantissas;
//    _normalize/_normalize1 nearest-even rounding incl. the exact tie rule
//    (libmp/libmpf.py:153-206) and trailing-zero stripping.
//  * mpf_add's perturbation shortcut for far-apart exponents
//    (offset > 100 and delta > prec + 4 -> shift by prec+4 and +-1,
//    libmpf.py:702-779) — required: deep orbits routinely add a ~1e-40
//    delta to a ~1 value.
//  * mpc_square for z**2 (exact a*a and b*b, rounded a*b, one rounded
//    subtraction; libmpc.py:163-171) behind mpc_pow_int's b==0 / a==0
//    special cases (libmpc.py:255-264: real axis -> mpf_pow_int n=2).
//  * mpc_pow_int's exact complex_int_pow path for d >= 3 (aligned integer
//    mantissas, exact binary exponentiation, one from_man_exp rounding per
//    component; libmpc.py:230-292) with the exact_size < 10000 guard —
//    past the guard we return UNSUPPORTED and Python falls back to mpmath.
//  * Per-algo step expressions exactly as perturb.py::_host_step evaluates
//    them on mpf/mpc operands (each *, -, + rounds at context prec,
//    nearest-even), incl. burning ship's (2*a)*b association.
//  * to_float: normalize1 to 53 bits nearest-even, then ldexp (libmpf.py:
//    454-489) — escape tests run on the f64 values exactly like the
//    Python loop.
//
// The reference project walks its orbit in f64 only (calc/src/lib.rs:
// 205-231; its deep-zoom/perturbation work was stalled) — this component
// has no reference counterpart to imitate, only mpmath to match.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

typedef uint64_t limb_t;
typedef unsigned __int128 dlimb_t;

// ---------------------------------------------------------------------
// Unsigned big integer: little-endian 64-bit limbs, no implicit
// normalization (callers strip leading zero limbs via trim()).
// ---------------------------------------------------------------------
struct Big {
    std::vector<limb_t> d;  // d[0] = least significant; empty == 0

    bool is_zero() const { return d.empty(); }
    void trim() { while (!d.empty() && d.back() == 0) d.pop_back(); }
};

static long long bitcount(const Big &a) {
    if (a.d.empty()) return 0;
    limb_t top = a.d.back();
    long long bits = (long long)(a.d.size() - 1) * 64;
    return bits + (64 - __builtin_clzll(top));
}

static int cmp(const Big &a, const Big &b) {
    if (a.d.size() != b.d.size()) return a.d.size() < b.d.size() ? -1 : 1;
    for (size_t i = a.d.size(); i-- > 0;) {
        if (a.d[i] != b.d[i]) return a.d[i] < b.d[i] ? -1 : 1;
    }
    return 0;
}

static Big add(const Big &a, const Big &b) {
    const Big &hi = a.d.size() >= b.d.size() ? a : b;
    const Big &lo = a.d.size() >= b.d.size() ? b : a;
    Big r;
    r.d.resize(hi.d.size() + 1, 0);
    unsigned char carry = 0;
    size_t i = 0;
    for (; i < lo.d.size(); i++) {
        dlimb_t s = (dlimb_t)hi.d[i] + lo.d[i] + carry;
        r.d[i] = (limb_t)s;
        carry = (unsigned char)(s >> 64);
    }
    for (; i < hi.d.size(); i++) {
        dlimb_t s = (dlimb_t)hi.d[i] + carry;
        r.d[i] = (limb_t)s;
        carry = (unsigned char)(s >> 64);
    }
    r.d[i] = carry;
    r.trim();
    return r;
}

// a - b, requires a >= b
static Big sub(const Big &a, const Big &b) {
    Big r;
    r.d.resize(a.d.size(), 0);
    unsigned char borrow = 0;
    for (size_t i = 0; i < a.d.size(); i++) {
        limb_t bi = i < b.d.size() ? b.d[i] : 0;
        dlimb_t s = (dlimb_t)a.d[i] - bi - borrow;
        r.d[i] = (limb_t)s;
        borrow = (unsigned char)((s >> 64) & 1);
    }
    r.trim();
    return r;
}

static Big mul(const Big &a, const Big &b) {
    if (a.is_zero() || b.is_zero()) return Big();
    Big r;
    r.d.assign(a.d.size() + b.d.size(), 0);
    for (size_t i = 0; i < a.d.size(); i++) {
        limb_t carry = 0;
        limb_t ai = a.d[i];
        for (size_t j = 0; j < b.d.size(); j++) {
            dlimb_t t = (dlimb_t)ai * b.d[j] + r.d[i + j] + carry;
            r.d[i + j] = (limb_t)t;
            carry = (limb_t)(t >> 64);
        }
        r.d[i + b.d.size()] = carry;
    }
    r.trim();
    return r;
}

static Big shl(const Big &a, long long n) {
    if (a.is_zero() || n == 0) return a;
    long long limbs = n / 64, bits = n % 64;
    Big r;
    r.d.assign(a.d.size() + limbs + 1, 0);
    for (size_t i = 0; i < a.d.size(); i++) {
        if (bits == 0) {
            r.d[i + limbs] = a.d[i];
        } else {
            r.d[i + limbs] |= a.d[i] << bits;
            r.d[i + limbs + 1] |= a.d[i] >> (64 - bits);
        }
    }
    r.trim();
    return r;
}

static Big shr(const Big &a, long long n) {
    if (a.is_zero()) return a;
    long long limbs = n / 64, bits = n % 64;
    if (limbs >= (long long)a.d.size()) return Big();
    Big r;
    r.d.assign(a.d.size() - limbs, 0);
    for (size_t i = 0; i < r.d.size(); i++) {
        limb_t lo = a.d[i + limbs];
        limb_t hi = (bits && i + limbs + 1 < a.d.size()) ? a.d[i + limbs + 1] : 0;
        r.d[i] = bits ? ((lo >> bits) | (hi << (64 - bits))) : lo;
    }
    r.trim();
    return r;
}

// any bit below position n set?  (mpmath's h_mask tie test: man & (1<<(n))-1)
static bool low_bits_set(const Big &a, long long n) {
    if (n <= 0) return false;
    long long limbs = n / 64, bits = n % 64;
    for (long long i = 0; i < limbs && i < (long long)a.d.size(); i++)
        if (a.d[i]) return true;
    if (bits && limbs < (long long)a.d.size())
        if (a.d[limbs] & ((limb_t(1) << bits) - 1)) return true;
    return false;
}

static bool bit_at(const Big &a, long long n) {
    long long limbs = n / 64, bits = n % 64;
    if (limbs >= (long long)a.d.size()) return false;
    return (a.d[limbs] >> bits) & 1;
}

static long long ctz(const Big &a) {
    for (size_t i = 0; i < a.d.size(); i++)
        if (a.d[i]) return (long long)i * 64 + __builtin_ctzll(a.d[i]);
    return 0;
}

static Big add_one(const Big &a) {
    Big one; one.d.push_back(1);
    return add(a, one);
}

static Big from_u64(limb_t v) {
    Big r;
    if (v) r.d.push_back(v);
    return r;
}

// ---------------------------------------------------------------------
// mpf: mpmath raw-tuple semantics (sign, man, exp, bc).  Mantissas are
// canonical (odd) after every rounded op; exact intermediates (prec=0
// muls inside mpc_square) may carry trailing zeros with exact bc, which
// is what mpmath's prec=0 mpf_mul returns too (libmpf.py:876-886).
// ---------------------------------------------------------------------
struct Mpf {
    int sign = 0;      // 0 / 1
    Big man;           // magnitude; empty == zero
    long long exp = 0;
    long long bc = 0;  // exact bitcount of man

    bool is_zero() const { return man.is_zero(); }
};

static const Mpf FZERO;

// mpmath _normalize1 with rnd='n' (nearest-even): round to prec bits,
// strip trailing zeros (libmpf.py:208-246).
static Mpf normalize1(int sign, Big man, long long exp, long long bc,
                      long long prec) {
    if (man.is_zero()) return FZERO;
    long long n = bc - prec;
    if (n > 0) {
        // t = man >> (n-1); round up iff (t&1) and ((t&2) or low bits set)
        bool t0 = bit_at(man, n - 1);
        bool up = t0 && (bit_at(man, n) || low_bits_set(man, n - 1));
        man = shr(man, n);
        if (up) man = add_one(man);
        exp += n;
        bc = bitcount(man);  // may have grown by the carry
    }
    long long tz = ctz(man);
    if (tz) {
        man = shr(man, tz);
        exp += tz;
        bc -= tz;
    }
    Mpf r;
    r.sign = sign;
    r.man = std::move(man);
    r.exp = exp;
    r.bc = bitcount(r.man);
    return r;
}

// mpf_mul (libmpf.py:876-900).  prec == 0 -> exact (no rounding, bc exact,
// trailing zeros kept) — mpc_square's p and q take this path.
static Mpf mpf_mul(const Mpf &s, const Mpf &t, long long prec) {
    if (s.is_zero() || t.is_zero()) return FZERO;
    Big man = mul(s.man, t.man);
    int sign = s.sign ^ t.sign;
    long long exp = s.exp + t.exp;
    long long bc = bitcount(man);
    if (prec) return normalize1(sign, std::move(man), exp, bc, prec);
    Mpf r;
    r.sign = sign;
    r.man = std::move(man);
    r.exp = exp;
    r.bc = bc;
    return r;
}

// mpf_add with _sub flag (libmpf.py:702-779) — including the perturbation
// shortcut for far-apart exponents, which matters constantly at depth.
static Mpf mpf_add(const Mpf &s_in, const Mpf &t_in, long long prec,
                   int _sub = 0) {
    const Mpf &s = s_in;
    Mpf t = t_in;  // local copy: sign may flip
    t.sign ^= _sub;
    if (!s.is_zero() && !t.is_zero()) {
        long long offset = s.exp - t.exp;
        if (offset > 0) {
            if (offset > 100) {
                long long delta = s.bc + s.exp - t.bc - t.exp;
                if (delta > prec + 4) {
                    long long off = prec + 4;
                    Big man = shl(s.man, off);
                    if (t.sign == s.sign) man = add_one(man);
                    else man = sub(man, from_u64(1));
                    long long bc = bitcount(man);
                    return normalize1(s.sign, std::move(man), s.exp - off,
                                      bc, prec);
                }
            }
            Big sman = shl(s.man, offset);
            Big man;
            int sign = s.sign;
            if (s.sign == t.sign) {
                man = add(t.man, sman);
            } else {
                if (cmp(sman, t.man) >= 0) {
                    man = sub(sman, t.man);
                    sign = s.sign;
                } else {
                    man = sub(t.man, sman);
                    sign = s.sign ^ 1;
                }
                if (man.is_zero()) return FZERO;
            }
            long long bc = bitcount(man);
            return normalize1(sign, std::move(man), t.exp, bc, prec);
        } else if (offset < 0) {
            if (offset < -100) {
                long long delta = t.bc + t.exp - s.bc - s.exp;
                if (delta > prec + 4) {
                    long long off = prec + 4;
                    Big man = shl(t.man, off);
                    if (s.sign == t.sign) man = add_one(man);
                    else man = sub(man, from_u64(1));
                    long long bc = bitcount(man);
                    return normalize1(t.sign, std::move(man), t.exp - off,
                                      bc, prec);
                }
            }
            Big tman = shl(t.man, -offset);
            Big man;
            int sign = s.sign;
            if (s.sign == t.sign) {
                man = add(s.man, tman);
            } else {
                // mpmath: if tsign: man = sman - tman else man = tman - sman
                const Big &pos = t.sign ? s.man : tman;
                const Big &neg = t.sign ? tman : s.man;
                if (cmp(pos, neg) >= 0) {
                    man = sub(pos, neg);
                    sign = 0;
                } else {
                    man = sub(neg, pos);
                    sign = 1;
                }
                if (man.is_zero()) return FZERO;
            }
            long long bc = bitcount(man);
            return normalize1(sign, std::move(man), s.exp, bc, prec);
        }
        // equal exponents
        Big man;
        int sign = s.sign;
        if (s.sign == t.sign) {
            man = add(t.man, s.man);
        } else {
            const Big &pos = s.sign ? t.man : s.man;
            const Big &neg = s.sign ? s.man : t.man;
            if (cmp(pos, neg) >= 0) {
                man = sub(pos, neg);
                sign = 0;
            } else {
                man = sub(neg, pos);
                sign = 1;
            }
            if (man.is_zero()) return FZERO;
        }
        long long bc = bitcount(man);
        return normalize1(sign, std::move(man), t.exp, bc, prec);
    }
    // zeros (finite values only here; inf/nan never occur in a walk —
    // escape always fires first at |z|^2 > limit^2 << f64 max)
    if (s.is_zero())
        return normalize1(t.sign, t.man, t.exp, t.bc, prec);
    return normalize1(s.sign, s.man, s.exp, s.bc, prec);
}

static Mpf mpf_sub(const Mpf &s, const Mpf &t, long long prec) {
    return mpf_add(s, t, prec, 1);
}

// subtlety-free exact ops
static Mpf mpf_neg_exact(const Mpf &s) {
    Mpf r = s;
    if (!r.is_zero()) r.sign ^= 1;
    return r;
}

static Mpf mpf_abs_exact(const Mpf &s) {
    Mpf r = s;
    r.sign = 0;
    return r;
}

static Mpf mpf_shift(const Mpf &s, long long n) {
    if (s.is_zero()) return s;
    Mpf r = s;
    r.exp += n;
    return r;
}

// 2*x as mpmath evaluates `2 * a`: mpf_mul_int(a, 2, prec) = man*2 then
// normalize — exact value, and normalization re-strips the even mantissa
// back to (man, exp+1), so a plain shift is bit-identical.
static Mpf mpf_double(const Mpf &s) { return mpf_shift(s, 1); }

// mpf_pow_int(s, 2, prec) (libmpf.py:1060-1069): exact square, one rounding
static Mpf mpf_square_rounded(const Mpf &s, long long prec) {
    if (s.is_zero()) return FZERO;
    Big man = mul(s.man, s.man);
    long long bc = bitcount(man);
    return normalize1(0, std::move(man), s.exp + s.exp, bc, prec);
}

// mpf_pow_int(s, n, prec) for n >= 3 via the exact path (libmpf.py:
// 1078-1083: man **= n when bc*n < 1000, one rounding).  Returns false
// when mpmath would take the directed-rounding ladder instead (bc*n >=
// 1000) — the caller then declines the whole walk.
static bool mpf_pow_int_exact(const Mpf &s, long long n, long long prec,
                              Mpf &out) {
    if (s.is_zero()) { out = FZERO; return true; }
    int result_sign = (int)(s.sign & n);  // odd n keeps the sign
    if (s.bc == 1 && s.man.d.size() == 1 && s.man.d[0] == 1) {
        out = Mpf();
        out.sign = result_sign;
        out.man = from_u64(1);
        out.exp = s.exp * n;
        out.bc = 1;
        return true;
    }
    if (s.bc * n >= 1000) return false;
    Big acc = from_u64(1);
    Big base = s.man;
    long long m = n;
    while (m) {
        if (m & 1) acc = mul(acc, base);
        base = mul(base, base);
        m >>= 1;
    }
    long long bc = bitcount(acc);
    out = normalize1(result_sign, std::move(acc), s.exp * n, bc, prec);
    return true;
}

// to_float with rnd='n' (libmpf.py:454-489): round to 53 bits nearest-even
// then ldexp.  Overflow -> +-inf, extreme underflow -> 0 via C ldexp
// (identical to math.ldexp).
static double to_double(const Mpf &s) {
    if (s.is_zero()) return 0.0;
    Mpf r = s.bc > 53 ? normalize1(s.sign, s.man, s.exp, s.bc, 53) : s;
    double m = 0.0;
    for (size_t i = r.man.d.size(); i-- > 0;)
        m = m * 18446744073709551616.0 + (double)r.man.d[i];
    if (r.sign) m = -m;
    if (r.exp > 3000) return r.sign ? -HUGE_VAL : HUGE_VAL;
    if (r.exp < -3000) return r.sign ? -0.0 : 0.0;
    return std::ldexp(m, (int)r.exp);
}

// ---------------------------------------------------------------------
// Signed big int for complex_int_pow (libmpc.py:230-243)
// ---------------------------------------------------------------------
struct SBig {
    int sign = 0;  // of nonzero value; zero has sign 0
    Big mag;
};

static SBig smul(const SBig &a, const SBig &b) {
    SBig r;
    r.mag = mul(a.mag, b.mag);
    r.sign = r.mag.is_zero() ? 0 : (a.sign ^ b.sign);
    return r;
}

static SBig sadd(const SBig &a, const SBig &b) {
    SBig r;
    if (a.sign == b.sign) {
        r.mag = add(a.mag, b.mag);
        r.sign = r.mag.is_zero() ? 0 : a.sign;
        return r;
    }
    int c = cmp(a.mag, b.mag);
    if (c == 0) return r;
    if (c > 0) { r.mag = sub(a.mag, b.mag); r.sign = a.sign; }
    else       { r.mag = sub(b.mag, a.mag); r.sign = b.sign; }
    return r;
}

static SBig ssub(const SBig &a, const SBig &b) {
    SBig nb = b;
    if (!nb.mag.is_zero()) nb.sign ^= 1;
    return sadd(a, nb);
}

static SBig sdouble(const SBig &a) {
    SBig r;
    r.mag = shl(a.mag, 1);
    r.sign = a.sign;
    return r;
}

// (a+bi)**n exactly for n >= 0 (complex_int_pow, libmpc.py:230-243)
static void complex_int_pow(SBig a, SBig b, long long n, SBig &wre,
                            SBig &wim) {
    wre = SBig(); wre.mag = from_u64(1);
    wim = SBig();
    while (n) {
        if (n & 1) {
            SBig nre = ssub(smul(wre, a), smul(wim, b));
            SBig nim = sadd(smul(wim, a), smul(wre, b));
            wre = nre; wim = nim;
            n -= 1;
        }
        SBig na = ssub(smul(a, a), smul(b, b));
        SBig nb = sdouble(smul(a, b));
        a = na; b = nb;
        n /= 2;
    }
}

// from_man_exp on a signed big (libmpf.py:291-317) with prec
static Mpf from_sbig(const SBig &v, long long exp, long long prec) {
    if (v.mag.is_zero()) return FZERO;
    return normalize1(v.sign, v.mag, exp, bitcount(v.mag), prec);
}

// ---------------------------------------------------------------------
// Complex step rules (exactly perturb.py::_host_step on mpmath operands)
// ---------------------------------------------------------------------
struct Mpc { Mpf re, im; };

// z**2 via mpc_pow_int(z, 2) (libmpc.py:255-271): real/imag-axis special
// cases first, else mpc_square.
static Mpc mpc_square_pow(const Mpc &z, long long prec) {
    Mpc r;
    if (z.im.is_zero()) {
        r.re = mpf_square_rounded(z.re, prec);
        return r;  // (mpf_pow_int(a, 2), fzero)
    }
    if (z.re.is_zero()) {
        // v = b**2; n%4 == 2 -> (-v, 0)
        r.re = mpf_neg_exact(mpf_square_rounded(z.im, prec));
        return r;
    }
    // mpc_square: p = a*a exact, q = b*b exact, r = round(a*b),
    // re = round(p - q), im = r << 1
    Mpf p = mpf_mul(z.re, z.re, 0);
    Mpf q = mpf_mul(z.im, z.im, 0);
    Mpf rr = mpf_mul(z.re, z.im, prec);
    r.re = mpf_sub(p, q, prec);
    r.im = mpf_shift(rr, 1);
    return r;
}

// z**n for n >= 3 via mpc_pow_int's paths (libmpc.py:255-292): axis
// special cases through mpf_pow_int's exact route, else aligned
// complex_int_pow.  Returns false when mpmath would take a path we
// don't replicate (mpf_pow_int's directed-rounding ladder at
// bc*n >= 1000; mpc exp/log at exact_size >= 10000) — the caller then
// falls back to the Python walk.
static bool mpc_pow_int_exact(const Mpc &z, long long n, long long prec,
                              Mpc &out) {
    if (z.im.is_zero()) {
        out.im = FZERO;
        return mpf_pow_int_exact(z.re, n, prec, out.re);
    }
    if (z.re.is_zero()) {
        Mpf v;
        if (!mpf_pow_int_exact(z.im, n, prec, v)) return false;
        out = Mpc();
        switch (n % 4) {
        case 0: out.re = v; break;
        case 1: out.im = v; break;
        case 2: out.re = mpf_neg_exact(v); break;
        default: out.im = mpf_neg_exact(v); break;
        }
        return true;
    }
    long long de = z.re.exp - z.im.exp;
    long long abs_de = de < 0 ? -de : de;
    long long mbc = z.re.bc > z.im.bc ? z.re.bc : z.im.bc;
    if (n * (abs_de + mbc) >= 10000) return false;
    SBig a, b;
    a.sign = z.re.sign; a.mag = z.re.man;
    b.sign = z.im.sign; b.mag = z.im.man;
    long long aexp = z.re.exp, bexp = z.im.exp;
    if (de > 0) { a.mag = shl(a.mag, de); aexp = bexp; }
    else if (de < 0) { b.mag = shl(b.mag, -de); bexp = aexp; }
    SBig wre, wim;
    complex_int_pow(a, b, n, wre, wim);
    out.re = from_sbig(wre, n * aexp, prec);
    out.im = from_sbig(wim, n * bexp, prec);
    return true;
}

// Exact mpf vs positive-finite-double comparison (mpf_cmp semantics:
// sign, then msb position exp+bc, then aligned mantissas).  Used for
// _direct_resolve's escape test `z2r*z2r + z2i*z2i > limit_sq`, which
// mpmath evaluates as an exact comparison after the rounded adds.
static int mpf_cmp_double(const Mpf &s, double v) {
    // v > 0 finite (limit**2); build its exact (man, exp)
    int e;
    double m = std::frexp(v, &e);
    uint64_t man = (uint64_t)std::ldexp(m, 53);
    long long exp = e - 53;
    int tz = __builtin_ctzll(man);
    man >>= tz;
    exp += tz;
    if (s.is_zero()) return -1;
    if (s.sign) return -1;
    long long sbc = s.bc + s.exp;
    long long vbc = (long long)(64 - __builtin_clzll(man)) + exp;
    if (sbc != vbc) return sbc < vbc ? -1 : 1;
    // align to common exponent and compare mantissas
    Big vm = from_u64(man);
    Big sm = s.man;
    if (s.exp > exp) sm = shl(sm, s.exp - exp);
    else if (exp > s.exp) vm = shl(vm, exp - s.exp);
    return cmp(sm, vm);
}

// algo ids (matching the dispatch in perturb.py::_host_step)
enum { ALGO_ZSQ = 0, ALGO_ZPOW = 1, ALGO_BURNINGSHIP = 2, ALGO_TRICORN = 3 };

// One step of perturb.py::_host_step on mpmath-semantics operands.
// Returns false when mpmath would take a path we don't replicate.
static bool host_step(int algo, long long power, long long prec,
                      const Mpc &z, const Mpc &c, Mpc &nz) {
    switch (algo) {
    case ALGO_ZSQ: {  // z**2 + c (mandelbrot/julia, d == 2)
        Mpc sq = mpc_square_pow(z, prec);
        nz.re = mpf_add(sq.re, c.re, prec);
        nz.im = mpf_add(sq.im, c.im, prec);
        return true;
    }
    case ALGO_ZPOW: {  // z**d + c, d >= 3 (multibrot / powered julia)
        Mpc p;
        if (!mpc_pow_int_exact(z, power, prec, p)) return false;
        nz.re = mpf_add(p.re, c.re, prec);
        nz.im = mpf_add(p.im, c.im, prec);
        return true;
    }
    case ALGO_BURNINGSHIP: {  // (|a| + i|b|)**2 + c via explicit reals
        Mpf a = mpf_abs_exact(z.re);
        Mpf b = mpf_abs_exact(z.im);
        // a*a - b*b + c.re : every op rounds at prec
        Mpf t = mpf_sub(mpf_mul(a, a, prec), mpf_mul(b, b, prec), prec);
        nz.re = mpf_add(t, c.re, prec);
        // (2*a)*b + c.im
        Mpf u = mpf_mul(mpf_double(a), b, prec);
        nz.im = mpf_add(u, c.im, prec);
        return true;
    }
    case ALGO_TRICORN: {  // conj(z)**2 + c via explicit reals
        const Mpf &a = z.re, &b = z.im;
        Mpf t = mpf_sub(mpf_mul(a, a, prec), mpf_mul(b, b, prec), prec);
        nz.re = mpf_add(t, c.re, prec);
        // (-2*a)*b + c.im
        Mpf u = mpf_mul(mpf_neg_exact(mpf_double(a)), b, prec);
        nz.im = mpf_add(u, c.im, prec);
        return true;
    }
    default:
        return false;
    }
}

static Mpf load_mpf(int sign, long long exp, const uint8_t *bytes,
                    long long len) {
    Mpf r;
    if (len <= 0) return r;
    r.man.d.assign((size_t)((len + 7) / 8), 0);
    for (long long i = 0; i < len; i++)
        r.man.d[(size_t)(i / 8)] |= (limb_t)bytes[i] << ((i % 8) * 8);
    r.man.trim();
    if (r.man.is_zero()) return r;
    r.sign = sign;
    r.exp = exp;
    r.bc = bitcount(r.man);
    return r;
}

}  // namespace

// ---------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------

extern "C" {

// Walk the orbit z_{k+1} = step(z_k, c) for `iters` steps or until
// |z|^2 > limit_sq on the f64-converted values (same check as the Python
// loop).  Inputs are raw mpf components (sign, little-endian mantissa
// bytes, exponent); out receives (iters+1) x 2 f64 rows starting with z0.
// Returns n (the break index, == the Python loop's n) or -1 when the walk
// would leave the replicated mpmath fast paths (caller falls back).
long long orbitwalk_run(
    int algo, long long power, long long prec,
    int z0r_sign, long long z0r_exp, const uint8_t *z0r_man, long long z0r_len,
    int z0i_sign, long long z0i_exp, const uint8_t *z0i_man, long long z0i_len,
    int cr_sign, long long cr_exp, const uint8_t *cr_man, long long cr_len,
    int ci_sign, long long ci_exp, const uint8_t *ci_man, long long ci_len,
    long long iters, double limit_sq, double *out) {
    Mpc z{load_mpf(z0r_sign, z0r_exp, z0r_man, z0r_len),
          load_mpf(z0i_sign, z0i_exp, z0i_man, z0i_len)};
    Mpc c{load_mpf(cr_sign, cr_exp, cr_man, cr_len),
          load_mpf(ci_sign, ci_exp, ci_man, ci_len)};

    long long n = 0;
    out[0] = to_double(z.re);
    out[1] = to_double(z.im);
    while (n < iters) {
        Mpc nz;
        if (!host_step(algo, power, prec, z, c, nz)) return -1;
        z = nz;
        n += 1;
        double zr = to_double(z.re), zi = to_double(z.im);
        out[2 * n] = zr;
        out[2 * n + 1] = zi;
        if (zr * zr + zi * zi > limit_sq) break;
    }
    return n;
}

// _direct_resolve's per-pixel loop (perturb.py::_direct_resolve): the
// escape test runs in mpmath arithmetic (rounded squares/sum at prec,
// exact comparison vs limit_sq), z freezes at its first beyond-limit
// value, and the escaping step is NOT counted.  out receives the final
// (re, im) as f64; the count is the return value.
long long orbitwalk_direct(
    int algo, long long power, long long prec,
    int z0r_sign, long long z0r_exp, const uint8_t *z0r_man, long long z0r_len,
    int z0i_sign, long long z0i_exp, const uint8_t *z0i_man, long long z0i_len,
    int cr_sign, long long cr_exp, const uint8_t *cr_man, long long cr_len,
    int ci_sign, long long ci_exp, const uint8_t *ci_man, long long ci_len,
    long long iters, double limit_sq, double *out) {
    Mpc z{load_mpf(z0r_sign, z0r_exp, z0r_man, z0r_len),
          load_mpf(z0i_sign, z0i_exp, z0i_man, z0i_len)};
    Mpc c{load_mpf(cr_sign, cr_exp, cr_man, cr_len),
          load_mpf(ci_sign, ci_exp, ci_man, ci_len)};

    long long n = 0;
    while (n < iters) {
        Mpc nz;
        if (!host_step(algo, power, prec, z, c, nz)) return -1;
        // z2.real*z2.real + z2.imag*z2.imag > limit_sq on mpf values
        Mpf d = mpf_add(mpf_mul(nz.re, nz.re, prec),
                        mpf_mul(nz.im, nz.im, prec), prec);
        z = nz;
        if (mpf_cmp_double(d, limit_sq) > 0) break;
        n += 1;
    }
    out[0] = to_double(z.re);
    out[1] = to_double(z.im);
    return n;
}

int orbitwalk_abi_version(void) { return 1; }

}  // extern "C"
