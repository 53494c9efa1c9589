"""Cook-Torrance PBR shading + material rules — jitted shading stage.

Re-implements the reference's PBR library (shaders/pbr.slang:15-146: GGX NDF,
Smith-Schlick geometry, Fresnel w/ and w/o roughness, Cook-Torrance specular,
`lighting()` combining kd/ks, n.l, shadows and a flat 0.2 ambient) and the
megakernel's material rules (raytracer.slang:199-224): albedo 1 except
lerp(per_block_unique_colour, 1, 0.5) for blocks with x > size/2;
roughness 0.8, metallic 0; optional hash-driven mirror blocks.

All inputs are (..., 3)/(...) arrays; everything fuses into the frame jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vvr_tpu.utils.hash import hash13, per_block_unique_colour

F32 = jnp.float32
PI = 3.1415926538


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def ndf(roughness, n, h):
    a = roughness * roughness
    a2 = a * a
    n_dot_h = jnp.maximum(_dot(n, h), 0.0)
    semi = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / (PI * semi * semi)


def g1(k, n, x):
    num = jnp.maximum(_dot(n, x), 0.0)
    return num / (num * (1.0 - k) + k)


def gsf(roughness, n, v, l):
    r = roughness + 1.0
    k = (r * r) / 8.0
    return g1(k, n, v) * g1(k, n, l)


def fresnel(f0, h, v):
    cos_t = _saturate(_dot(h, v))
    return f0 + (1.0 - f0) * jnp.power(1.0 - cos_t, 5.0)[..., None]


def _cexp(x):
    """Channel-expand: [..., None] for per-lane arrays, identity for 0-d
    trace-time constants (which broadcast by themselves)."""
    return x if getattr(x, "ndim", 1) == 0 else x[..., None]


def fresnel_roughness(f0, v, x, roughness):
    cos_t = _saturate(1.0 - jnp.maximum(_dot(v, x), 0.0))
    return f0 + (jnp.maximum(1.0 - _cexp(roughness), f0) - f0) \
        * jnp.power(cos_t, 5.0)[..., None]


def specular(f0, roughness, v, l, n, h):
    num = ndf(roughness, n, h)[..., None] * gsf(roughness, n, v, l)[..., None] \
        * fresnel(f0, h, v)
    denom = 4.0 * jnp.maximum(_dot(v, n), 0.0) * jnp.maximum(_dot(l, n), 0.0)
    tmp = num / jnp.maximum(denom, 1e-4)[..., None]
    return jnp.where(jnp.isinf(tmp), 1000.0, jnp.clip(tmp, 0.0, 1000.0))


def lighting(position, albedo, normal, roughness, metallic, visibility,
             shadows, view, sun_dir, sun_color):
    """pbr.slang:90-146 `lighting()`; view = direction surface->camera.

    `roughness`/`metallic` may be 0-d trace-time constants (the terrain
    material is a uniform roughness 0.8 / metallic 0 — raytracer.slang:
    199-224); the metallic == 0 subchains are then folded BY HAND below.
    Each fold is bit-exact for finite inputs: (albedo-0.04)*0 == 0 and
    (1-ks)*(1-0) == (1-ks) elementwise, and the scalar f0 = 0.04 equals
    the per-channel f0 the array path would compute."""
    half_view = view + sun_dir
    half_view = half_view / jnp.maximum(
        jnp.linalg.norm(half_view, axis=-1, keepdims=True), 1e-12)
    m_zero = (getattr(metallic, "ndim", 1) == 0
              and not isinstance(metallic, jax.core.Tracer)
              and float(metallic) == 0.0)
    if m_zero:
        f0 = jnp.float32(0.04)
        ks = fresnel_roughness(f0, half_view, view, roughness)
        kd = 1.0 - ks
    else:
        f0 = 0.04 + (albedo - 0.04) * _cexp(metallic)
        ks = fresnel_roughness(f0, half_view, view, roughness)
        kd = (1.0 - ks) * (1.0 - _cexp(metallic))

    spec = specular(f0, roughness, view, sun_dir, normal, half_view)
    n_dot_l = jnp.maximum(_dot(sun_dir, normal), 0.0)

    outgoing = (kd * albedo / PI + spec) * sun_color \
        * n_dot_l[..., None] * shadows[..., None]
    ambient = 0.2 * albedo * kd * visibility[..., None]
    return outgoing + ambient * 0.2


def lighting_soa(albedo, normal, roughness, visibility, shadows, view,
                 sun_dir, sun_color):
    """SoA `lighting()` for the frame's uniform terrain material
    (metallic == 0, scalar roughness — the m_zero fold of lighting()):
    every per-lane array is flat (N,), channels separate. (N, k) arrays
    with tiny minor axes run at k/128 lane utilization on TPU — the
    round-4 profile measured the AoS tail's select fusions at 25.6 ms
    per channel versus ~1 ms flat.

    albedo/normal/view: 3-tuples of (N,); sun_dir: (3,) constant (all
    shadow rays share the sun direction); sun_color: (3,); roughness:
    python/0-d scalar; visibility/shadows: (N,). Returns (r, g, b)."""
    ax, ay, az = albedo
    nx, ny, nz = normal
    vx, vy, vz = view
    sx, sy, sz = sun_dir[0], sun_dir[1], sun_dir[2]
    hx, hy, hz = vx + sx, vy + sy, vz + sz
    hn = jnp.maximum(jnp.sqrt(hx * hx + hy * hy + hz * hz), 1e-12)
    hx, hy, hz = hx / hn, hy / hn, hz / hn

    f0 = jnp.float32(0.04)
    # fresnel_roughness(f0, h, view, roughness) — scalar f0 path
    hv = jnp.clip(hx * vx + hy * vy + hz * vz, 0.0, 1.0)
    cos_t = _saturate(1.0 - jnp.maximum(hv, 0.0))
    ks = f0 + (jnp.maximum(1.0 - roughness, f0) - f0) * jnp.power(cos_t, 5.0)
    kd = 1.0 - ks

    # specular(f0, roughness, view, sun, normal, half)
    a = roughness * roughness
    a2 = a * a
    n_dot_h = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
    semi = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    nd = a2 / (PI * semi * semi)
    r1 = roughness + 1.0
    k = (r1 * r1) / 8.0
    nv = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
    nl = jnp.maximum(nx * sx + ny * sy + nz * sz, 0.0)
    g = (nv / (nv * (1.0 - k) + k)) * (nl / (nl * (1.0 - k) + k))
    fr = f0 + (1.0 - f0) * jnp.power(1.0 - hv, 5.0)
    denom = jnp.maximum(4.0 * nv * nl, 1e-4)
    tmp = nd * g * fr / denom
    spec = jnp.where(jnp.isinf(tmp), 1000.0, jnp.clip(tmp, 0.0, 1000.0))

    n_dot_l = jnp.maximum(sx * nx + sy * ny + sz * nz, 0.0)
    w = n_dot_l * shadows
    amb = 0.2 * kd * visibility * 0.2
    out_r = (kd * ax / PI + spec) * sun_color[0] * w + amb * ax
    out_g = (kd * ay / PI + spec) * sun_color[1] * w + amb * ay
    out_b = (kd * az / PI + spec) * sun_color[2] * w + amb * az
    return out_r, out_g, out_b


def material_at_soa(bx, by, bz, world_size: int):
    """SoA material rules for the uniform terrain material (the mirror
    variant stays AoS — config 4 stacks once). Returns
    (alb_r, alb_g, alb_b) flat; roughness/metallic are the 0-d constants
    material_at returns.

    The block-colour hash itself stays AoS: hash chains amplify any ulp
    difference to O(1) through fract discontinuities, and XLA's FMA
    contraction of the reassociated SoA form produced DIFFERENT colors
    under jit than the golden images' graph (round-4 debugging: 0.38
    albedo maxdiff, 16% of terrain pixels). The (N, 3) stack here is one
    relayout of an i32 column triple — a few ms, not the 25 ms/channel
    the select-tree fusions cost."""
    col = per_block_unique_colour(
        jnp.stack([bx, by, bz], -1).astype(F32))
    cr, cg, cb = col[:, 0], col[:, 1], col[:, 2]
    hi = bx > world_size // 2
    alb_r = jnp.where(hi, cr + (1.0 - cr) * 0.5, 1.0)
    alb_g = jnp.where(hi, cg + (1.0 - cg) * 0.5, 1.0)
    alb_b = jnp.where(hi, cb + (1.0 - cb) * 0.5, 1.0)
    return alb_r, alb_g, alb_b


def get_face_normal_soa(face, sgnx, sgny, sgnz):
    """SoA get_face_normal: (nx, ny, nz) flat arrays."""
    return (jnp.where(face == 0, -sgnx, 0.0),
            jnp.where(face == 1, -sgny, 0.0),
            jnp.where(face == 2, -sgnz, 0.0))


def material_at(block_pos, world_size: int, mirror_materials: bool = False):
    """Material rules (raytracer.slang:199-224). Returns
    (albedo (...,3), roughness (...), metallic (...), special (...))."""
    bp = block_pos.astype(F32)
    col = per_block_unique_colour(block_pos.astype(F32))
    albedo = jnp.where((block_pos[..., 0] > world_size // 2)[..., None],
                       col + (1.0 - col) * 0.5, 1.0)
    roughness = jnp.float32(0.80)   # uniform material: 0-d trace-time
    metallic = jnp.float32(0.0)     # constants (lighting() folds them)
    special = jnp.float32(0.0)
    if mirror_materials:
        # the reference's commented-out mirror-block rule
        # (raytracer.slang:219-222): hash-chosen 8^3 block groups
        special = hash13(jnp.floor(bp / 8.0))
        metallic = jnp.where(special > 0.8, 1.0, 0.0)
    return albedo, roughness, metallic, special


def get_face_normal(face, dir_sign):
    """-(face == axis) * sign (other.slang:62-64): the entry-face normal
    opposes the ray direction on that axis. Select-based (a per-row eye[face]
    gather lowers poorly on TPU)."""
    fsel = jnp.stack([face == 0, face == 1, face == 2], -1).astype(F32)
    return -fsel * dir_sign


def aces(x):
    """ACES filmic tonemap (lighting.slang:7-14)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def ao_solver(is_solid_fn, block_pos, uv, face, dir_sign):
    """Minecraft-style smooth per-vertex AO (lighting.slang:16-90): for each
    axis, probe the 4 corner + 4 side neighbours one step off the hit face
    (offset flipped by the ray sign on that axis), spread side occlusion to
    adjacent corners, and bilinearly interpolate by the in-face uv. Returns
    ao in [0, 1] (product over the three axis solves, :84-89).

    is_solid_fn: callable (..., 3) int -> bool (e.g. world.bricks.is_solid or
    a dense-occupancy lookup). block_pos (..., 3) i32; uv (..., 3) f32
    fractional position in the block; face (...,) i32; dir_sign (..., 3) f32.
    """
    corners = [(-1, -1), (-1, 1), (1, -1), (1, 1)]          # :33-38
    sides = [(-1, 0), (1, 0), (0, -1), (0, 1)]              # :40-45
    corner_from_side = [(0, 1), (2, 3), (0, 2), (1, 3)]     # :47-52

    def check(offset_axis_i, oa, ob, i, a, b, target_face):
        # check(): flip the probe along the target axis when the ray sign is
        # negative there (:22-28); only contributes when face == target axis.
        off = [None, None, None]
        off[i] = jnp.where(dir_sign[..., i] < 0,
                           -offset_axis_i, offset_axis_i)
        off[a] = jnp.full_like(block_pos[..., 0], oa)
        off[b] = jnp.full_like(block_pos[..., 0], ob)
        probe = block_pos + jnp.stack([off[0], off[1], off[2]], -1)
        return (face == i) & is_solid_fn(probe)

    total = jnp.ones(block_pos.shape[:-1], F32)
    for i, a, b in ((0, 1, 2), (2, 1, 0), (1, 0, 2)):        # :84-87
        c = [check(-1, ca, cb, i, a, b, i) for (ca, cb) in corners]
        for s, (sa, sb) in enumerate(sides):
            side_occ = check(-1, sa, sb, i, a, b, i)
            for ci in corner_from_side[s]:
                c[ci] = c[ci] | side_occ
        sel = [jnp.where(x, 1.0, 0.0) for x in c]
        ub = uv[..., b]
        ua = uv[..., a]
        interp = 1.0 - ((sel[0] + (sel[1] - sel[0]) * ub) * (1.0 - ua)
                        + (sel[2] + (sel[3] - sel[2]) * ub) * ua)
        total = total * interp
    return total


def global_face(face, dir_sign):
    """Axis face + ray sign -> global face id 0..5 (other.slang:66-76):
    x:(neg->1,pos->0)... the reference maps positive sign to the odd id."""
    fs = jnp.stack([dir_sign[..., 0], dir_sign[..., 1], dir_sign[..., 2]], -1)
    s = jnp.where(face == 0, dir_sign[..., 0],
                  jnp.where(face == 1, dir_sign[..., 1], dir_sign[..., 2]))
    return face * 2 + jnp.where(s > 0, 1, 0)


def flatten_uvs(face, uvs):
    """Drop the face axis from a 3D in-block uv (other.slang:80-89)."""
    u = jnp.where(face == 0, uvs[..., 1],
                  jnp.where(face == 1, uvs[..., 0], uvs[..., 0]))
    v = jnp.where(face == 2, uvs[..., 1], uvs[..., 2])
    return jnp.stack([u, v], -1)


def unflatten_uvs(face, negate, flat):
    """Inverse of flatten_uvs with the face-axis coordinate set to 0 or 3
    (other.slang:91-102)."""
    val = jnp.where(negate, 3, 0)
    x = jnp.where(face == 0, val, flat[..., 0])
    y = jnp.where(face == 1, val, jnp.where(face == 0, flat[..., 0], flat[..., 1]))
    z = jnp.where(face == 2, val, flat[..., 1])
    return jnp.stack([x, y, z], -1)
