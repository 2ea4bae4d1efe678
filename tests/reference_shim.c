/* Thin C shim over the REFERENCE library's public C API, built and linked
 * against an out-of-source build of /root/reference (library only — no CLI
 * or tests, so no network-fetched dependencies). Used exclusively by
 * tests/test_reference_binary.py to differentially validate ssim_tpu
 * against the actual reference implementation (not only its frozen
 * constants).
 *
 * This calls the reference's published API (include/rmgr/ssim.h:605);
 * nothing here reimplements or copies reference internals.
 */

#include <stddef.h>
#include <stdint.h>
#include <stdlib.h>
#include <rmgr/ssim.h>

#ifdef __cplusplus
extern "C"
#endif
int reference_compute_ssim(const uint8_t* a, const uint8_t* b,
                           uint32_t width, uint32_t height,
                           float* out_ssim, float* out_map) {
    rmgr_ssim_Params params;
    for (size_t i = 0; i < sizeof(params); ++i) ((char*)&params)[i] = 0;
    params.width = width;
    params.height = height;
    rmgr_ssim_init_interleaved(&params.imgA, a, (ptrdiff_t)width, 1, 0);
    rmgr_ssim_init_interleaved(&params.imgB, b, (ptrdiff_t)width, 1, 0);
    params.ssimMap = out_map;
    params.ssimStep = 1;
    params.ssimStride = (ptrdiff_t)width;
    rmgr_ssim_use_default_allocator(&params);
    return rmgr_ssim_compute_ssim(out_ssim, &params, NULL);
}

/* Fully general layout entry: raw topLeft/step/stride per image (bytes)
 * and ssimStep/ssimStride for the map (floats) — exercises the
 * reference's documented addressing contract (include/rmgr/ssim.h:481-488
 * and :514-516) so ssim_tpu's ImageView.from_strided / Params map layout
 * can be validated against the reference binary on interleaved,
 * bottom-up, and subsampled-map layouts, not just contiguous ones. */
#ifdef __cplusplus
extern "C"
#endif
int reference_compute_ssim_strided(
    const uint8_t* a_topleft, ptrdiff_t a_step, ptrdiff_t a_stride,
    const uint8_t* b_topleft, ptrdiff_t b_step, ptrdiff_t b_stride,
    uint32_t width, uint32_t height, float* out_ssim,
    float* map_topleft, ptrdiff_t map_step, ptrdiff_t map_stride) {
    rmgr_ssim_Params params;
    for (size_t i = 0; i < sizeof(params); ++i) ((char*)&params)[i] = 0;
    params.width = width;
    params.height = height;
    params.imgA.topLeft = a_topleft;
    params.imgA.step = a_step;
    params.imgA.stride = a_stride;
    params.imgB.topLeft = b_topleft;
    params.imgB.step = b_step;
    params.imgB.stride = b_stride;
    params.ssimMap = map_topleft;
    params.ssimStep = map_step;
    params.ssimStride = map_stride;
    rmgr_ssim_use_default_allocator(&params);
    return rmgr_ssim_compute_ssim(out_ssim, &params, NULL);
}
