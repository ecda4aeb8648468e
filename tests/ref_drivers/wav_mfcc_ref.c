/* Head-to-head driver built against the REFERENCE's own code: decodes a WAV
 * with vv_dsp_wav_read (src/audio/wav.c, compiled from source — the reference
 * build defaults VV_DSP_ENABLE_AUDIO_IO=OFF) and optionally runs its
 * STFT-spectrogram -> power -> vv_dsp_mfcc_process chain
 * (src/spectral/stft.c:112-144, src/features/mel.c:408-450), printing text.
 *
 * Modes:
 *   wav_mfcc_ref FILE info                 -> "samples channels rate bits isfloat"
 *   wav_mfcc_ref FILE data                 -> one sample per line, planar order
 *   wav_mfcc_ref FILE mfcc [nfft hop nmels nmfcc lifter]
 *                                          -> one frame of MFCCs per line
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "vv_dsp/audio/wav.h"
#include "vv_dsp/features/mel.h"
#include "vv_dsp/spectral/stft.h"
#include "vv_dsp/vv_dsp_types.h"

int main(int argc, char** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s FILE info|data|mfcc [nfft hop nmels nmfcc lifter]\n",
                argv[0]);
        return 2;
    }
    vv_dsp_real** buf = NULL;
    vv_dsp_wav_info info;
    if (vv_dsp_wav_read(argv[1], &buf, &info) != VV_DSP_OK) {
        fprintf(stderr, "wav read failed: %s\n", vv_dsp_wav_get_error_string());
        return 1;
    }
    if (!strcmp(argv[2], "info")) {
        printf("%zu %d %.6g %d %d\n", info.num_samples, info.num_channels,
               info.sample_rate, info.bit_depth, info.is_float);
    } else if (!strcmp(argv[2], "data")) {
        for (int c = 0; c < info.num_channels; ++c)
            for (size_t i = 0; i < info.num_samples; ++i)
                printf("%.9g\n", (double)buf[c][i]);
    } else if (!strcmp(argv[2], "mfcc")) {
        size_t nfft = argc > 3 ? (size_t)atoi(argv[3]) : 1024;
        size_t hop = argc > 4 ? (size_t)atoi(argv[4]) : 256;
        size_t nmels = argc > 5 ? (size_t)atoi(argv[5]) : 26;
        size_t nmfcc = argc > 6 ? (size_t)atoi(argv[6]) : 13;
        vv_dsp_real lifter = argc > 7 ? (vv_dsp_real)atof(argv[7])
                                      : (vv_dsp_real)22.0;
        size_t n = info.num_samples;
        size_t nf = (n < nfft) ? 1 : 1 + (n - nfft + hop) / hop;
        vv_dsp_stft* st = NULL;
        vv_dsp_stft_params p;
        p.fft_size = nfft;
        p.hop_size = hop;
        p.window = VV_DSP_STFT_WIN_HANN;
        if (vv_dsp_stft_create(&p, &st) != VV_DSP_OK) return 1;
        vv_dsp_real* mag =
            (vv_dsp_real*)malloc(nf * nfft * sizeof(vv_dsp_real));
        size_t got_frames = 0;
        if (vv_dsp_stft_spectrogram(st, buf[0], n, mag, &got_frames)
            != VV_DSP_OK)
            return 1;
        size_t bins = nfft / 2 + 1;
        vv_dsp_real* power =
            (vv_dsp_real*)malloc(got_frames * bins * sizeof(vv_dsp_real));
        for (size_t f = 0; f < got_frames; ++f)
            for (size_t k = 0; k < bins; ++k) {
                vv_dsp_real m = mag[f * nfft + k];
                power[f * bins + k] = m * m;
            }
        vv_dsp_mfcc_plan* plan = NULL;
        if (vv_dsp_mfcc_init(nfft, nmels, nmfcc,
                             (vv_dsp_real)info.sample_rate, (vv_dsp_real)0,
                             (vv_dsp_real)(info.sample_rate / 2),
                             VV_DSP_MEL_VARIANT_HTK, VV_DSP_DCT_II, lifter,
                             (vv_dsp_real)1e-10, &plan) != VV_DSP_OK)
            return 1;
        vv_dsp_real* out =
            (vv_dsp_real*)malloc(got_frames * nmfcc * sizeof(vv_dsp_real));
        if (vv_dsp_mfcc_process(plan, power, got_frames, out) != VV_DSP_OK)
            return 1;
        for (size_t f = 0; f < got_frames; ++f)
            for (size_t k = 0; k < nmfcc; ++k)
                printf("%.9g%s", (double)out[f * nmfcc + k],
                       k + 1 < nmfcc ? " " : "\n");
        vv_dsp_mfcc_destroy(plan);
        vv_dsp_stft_destroy(st);
    } else {
        return 2;
    }
    vv_dsp_wav_free_buffer(&buf, info.num_channels);
    return 0;
}
