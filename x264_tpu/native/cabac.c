/* CABAC binary arithmetic encoder — the serial FSM tail of the entropy
 * coder (spec 9.3.4; engine semantics of common/cabac.c:807-926).
 *
 * The TPU pipeline emits a *compacted, packed bin-operation stream*
 * (the parallel part); this engine consumes it sequentially at native
 * speed. Each op is one uint32:
 *     kind = op >> 29,  b = (op >> 17) & 0xFFF,  a = op & 0x1FFFF
 *   kind 0: decision         a = ctx index, b = bin
 *   kind 1: raw bypass bits  a = value, b = nbits (MSB first)
 *   kind 2: ue bypass        a = value, b = exp_bits (k-th exp-Golomb)
 *   kind 3: terminal(0)      (end_of_slice_flag = 0)
 *   kind 4: pad (ignored)
 *   kind 5: repeated 1-bins  a = ctx index, b = count (level prefixes)
 * The final terminal(1) + alignment is emitted by the flush, as in the
 * reference (x264_cabac_encode_flush).
 */
#include <stdint.h>

typedef struct {
    uint32_t low;
    int range;
    int queue;
    int outstanding;
    uint8_t *p;
} cabac_t;

static void putbyte(cabac_t *cb)
{
    if (cb->queue >= 8) {
        int out = cb->low >> (cb->queue + 2);
        cb->low &= (4u << cb->queue) - 1;
        cb->queue -= 8;
        if ((out & 0xff) == 0xff) {
            cb->outstanding++;
        } else {
            int carry = out >> 8;
            cb->p[-1] += (uint8_t)carry;
            while (cb->outstanding > 0) {
                *(cb->p++) = (uint8_t)(carry - 1);
                cb->outstanding--;
            }
            *(cb->p++) = (uint8_t)out;
        }
    }
}

static void renorm(cabac_t *cb)
{
    while (cb->range < 0x100) {
        cb->range <<= 1;
        cb->low <<= 1;
        cb->queue += 1;
    }
    putbyte(cb);
}

static void decision(cabac_t *cb, uint8_t *state,
                     const uint8_t *range_lps, const uint8_t *transition,
                     int ctx, int b)
{
    int s = state[ctx];
    int lps = range_lps[s * 4 + ((cb->range >> 6) & 3)];
    cb->range -= lps;
    if (b != (s >> 6)) {
        cb->low += (uint32_t)cb->range;
        cb->range = lps;
    }
    state[ctx] = transition[s * 2 + b];
    renorm(cb);
}

long cabac_encode(uint8_t *state,
                  const uint8_t *range_lps,   /* [128][4] */
                  const uint8_t *transition,  /* [128][2] */
                  const uint32_t *ops, long n,
                  uint8_t *out)
{
    cabac_t cb;
    long i;
    cb.low = 0;
    cb.range = 0x01FE;
    cb.queue = -1;          /* first shifted bit is not written */
    cb.outstanding = 0;
    cb.p = out + 1;         /* out[0] = last slice-header byte (carry sink) */

    for (i = 0; i < n; i++) {
        uint32_t op = ops[i];
        int k = op >> 29;
        int b = (op >> 17) & 0xFFF;
        int a = op & 0x1FFFF;
        if (k == 0) {
            decision(&cb, state, range_lps, transition, a, b & 1);
        } else if (k == 5) {
            int j;
            for (j = 0; j < b; j++)
                decision(&cb, state, range_lps, transition, a, 1);
        } else if (k == 1) {
            int j;
            for (j = b - 1; j >= 0; j--) {
                cb.low <<= 1;
                cb.low += (uint32_t)(-((a >> j) & 1)) & (uint32_t)cb.range;
                cb.queue += 1;
                putbyte(&cb);
            }
        } else if (k == 2) {
            /* k-th order exp-Golomb in bypass mode
             * (x264_cabac_encode_ue_bypass, common/cabac.c:875) */
            int kk = b, ii, val = a;
            uint32_t x;
            while (val >= (1 << kk)) {
                val -= 1 << kk;
                kk++;
            }
            x = (((1u << (kk - b)) - 1) << (kk + 1)) + (uint32_t)val;
            kk = 2 * kk + 1 - b;
            ii = ((kk - 1) & 7) + 1;
            do {
                kk -= ii;
                cb.low <<= ii;
                cb.low += ((x >> kk) & 0xff) * (uint32_t)cb.range;
                cb.queue += ii;
                putbyte(&cb);
                ii = 8;
            } while (kk > 0);
        } else if (k == 3) {
            cb.range -= 2;
            renorm(&cb);
        } /* k == 4: pad */
    }

    /* flush: final end_of_slice_flag = 1 + rbsp stop + alignment
     * (x264_cabac_encode_flush, common/cabac.c:908) */
    cb.low += (uint32_t)cb.range - 2;
    cb.low |= 1;
    cb.low <<= 9;
    cb.queue += 9;
    putbyte(&cb);
    putbyte(&cb);
    cb.low <<= 8 - cb.queue;
    cb.queue = 8;
    putbyte(&cb);
    while (cb.outstanding > 0) {
        *(cb.p++) = 0xff;
        cb.outstanding--;
    }
    return (long)(cb.p - (out + 1));
}
