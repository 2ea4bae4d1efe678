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
