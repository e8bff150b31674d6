"""Interactive 3D scene export: self-contained WebGL HTML.

Equivalent capability to the reference's open3d interactive viewer
(mmdet3d/core/visualizer/open3d_vis.py:1-460, `Visualizer` with orbit
controls, colored points, green GT / red pred oriented boxes) — but
headless-friendly: `export_scene_html` writes ONE dependency-free HTML
file (inline WebGL1 shaders, no CDN, zero egress) that any browser
opens with full orbit/zoom/pan interaction. This replaces a GUI the
TPU host cannot run with an artifact it can always produce.

Points are drawn as GL_POINTS (height- or intensity-colormapped),
boxes as GL_LINES wireframes of the 12 edges; the camera is a
spherical orbit around the scene centroid (drag = rotate, wheel =
zoom, shift-drag = pan).
"""

import json
import os

import numpy as np

from ..core.box_np_ops import corners_3d

__all__ = ['export_scene_html']

_EDGES = [(0, 1), (1, 3), (3, 2), (2, 0),
          (4, 5), (5, 7), (7, 6), (6, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]

_HTML = """<!DOCTYPE html><html><head><meta charset="utf-8">
<title>dfm_tpu scene</title><style>
 html,body{margin:0;height:100%;overflow:hidden;background:#111}
 canvas{width:100%;height:100%;display:block}
 #hud{position:fixed;top:8px;left:10px;color:#ccc;
      font:12px monospace;user-select:none}
</style></head><body>
<div id="hud">drag: orbit &middot; wheel: zoom &middot;
 shift-drag: pan &middot; green: GT &middot; red: pred</div>
<canvas id="c"></canvas>
<script>
const DATA = __DATA__;
const cv = document.getElementById('c');
const gl = cv.getContext('webgl');
const VS = `attribute vec3 p; attribute vec3 col; uniform mat4 mvp;
 varying vec3 vc; void main(){ gl_Position = mvp*vec4(p,1.0);
 gl_PointSize = 2.0; vc = col; }`;
const FS = `precision mediump float; varying vec3 vc;
 void main(){ gl_FragColor = vec4(vc,1.0); }`;
function sh(t,s){const o=gl.createShader(t);gl.shaderSource(o,s);
 gl.compileShader(o);return o;}
const prog = gl.createProgram();
gl.attachShader(prog, sh(gl.VERTEX_SHADER, VS));
gl.attachShader(prog, sh(gl.FRAGMENT_SHADER, FS));
gl.linkProgram(prog); gl.useProgram(prog);
const locP = gl.getAttribLocation(prog,'p');
const locC = gl.getAttribLocation(prog,'col');
const locM = gl.getUniformLocation(prog,'mvp');
function buf(a){const b=gl.createBuffer();
 gl.bindBuffer(gl.ARRAY_BUFFER,b);
 gl.bufferData(gl.ARRAY_BUFFER,new Float32Array(a),gl.STATIC_DRAW);
 return b;}
const ptsB = buf(DATA.pts), ptsCB = buf(DATA.ptsCol);
const linB = buf(DATA.lines), linCB = buf(DATA.lineCol);
const nPts = DATA.pts.length/3, nLin = DATA.lines.length/3;
let yaw=-0.9, pitch=0.5, dist=DATA.radius*2.2,
    ctr=DATA.center.slice();
function mat(){
 const cy=Math.cos(yaw),sy=Math.sin(yaw),
       cp=Math.cos(pitch),sp=Math.sin(pitch);
 const eye=[ctr[0]+dist*cp*cy, ctr[1]+dist*cp*sy, ctr[2]+dist*sp];
 const f=norm3(sub3(ctr,eye)), r=norm3(cross(f,[0,0,1])),
       u=cross(r,f);
 const ar=cv.width/cv.height, fov=1.0, n=0.05, fr=dist*40;
 const t=1/Math.tan(fov/2);
 // column-major view * proj
 const v=[r[0],u[0],-f[0],0, r[1],u[1],-f[1],0, r[2],u[2],-f[2],0,
  -dot3(r,eye),-dot3(u,eye),dot3(f,eye),1];
 const p=[t/ar,0,0,0, 0,t,0,0, 0,0,(fr+n)/(n-fr),-1,
  0,0,2*fr*n/(n-fr),0];
 return mul44(p,v);}
function sub3(a,b){return [a[0]-b[0],a[1]-b[1],a[2]-b[2]];}
function dot3(a,b){return a[0]*b[0]+a[1]*b[1]+a[2]*b[2];}
function cross(a,b){return [a[1]*b[2]-a[2]*b[1],
 a[2]*b[0]-a[0]*b[2], a[0]*b[1]-a[1]*b[0]];}
function norm3(a){const l=Math.hypot(a[0],a[1],a[2])||1;
 return [a[0]/l,a[1]/l,a[2]/l];}
function mul44(a,b){const o=new Array(16).fill(0);
 for(let i=0;i<4;i++)for(let j=0;j<4;j++)for(let k=0;k<4;k++)
  o[j*4+i]+=a[k*4+i]*b[j*4+k]; return o;}
function draw(){
 cv.width=innerWidth; cv.height=innerHeight;
 gl.viewport(0,0,cv.width,cv.height);
 gl.clearColor(0.067,0.067,0.067,1);
 gl.enable(gl.DEPTH_TEST);
 gl.clear(gl.COLOR_BUFFER_BIT|gl.DEPTH_BUFFER_BIT);
 gl.uniformMatrix4fv(locM,false,new Float32Array(mat()));
 gl.enableVertexAttribArray(locP); gl.enableVertexAttribArray(locC);
 gl.bindBuffer(gl.ARRAY_BUFFER,ptsB);
 gl.vertexAttribPointer(locP,3,gl.FLOAT,false,0,0);
 gl.bindBuffer(gl.ARRAY_BUFFER,ptsCB);
 gl.vertexAttribPointer(locC,3,gl.FLOAT,false,0,0);
 gl.drawArrays(gl.POINTS,0,nPts);
 if(nLin){
  gl.bindBuffer(gl.ARRAY_BUFFER,linB);
  gl.vertexAttribPointer(locP,3,gl.FLOAT,false,0,0);
  gl.bindBuffer(gl.ARRAY_BUFFER,linCB);
  gl.vertexAttribPointer(locC,3,gl.FLOAT,false,0,0);
  gl.drawArrays(gl.LINES,0,nLin);}
 requestAnimationFrame(draw);}
let drag=false,pan=false,lx=0,ly=0;
cv.onmousedown=e=>{drag=true;pan=e.shiftKey;lx=e.clientX;ly=e.clientY;};
onmouseup=()=>drag=false;
onmousemove=e=>{if(!drag)return;
 const dx=e.clientX-lx, dy=e.clientY-ly; lx=e.clientX; ly=e.clientY;
 if(pan){const s=dist*0.002;
  ctr[0]-=s*dx*Math.sin(yaw); ctr[1]+=s*dx*Math.cos(yaw);
  ctr[2]+=s*dy;}
 else{yaw-=dx*0.006;
  pitch=Math.min(1.5,Math.max(-1.5,pitch+dy*0.006));}};
onwheel=e=>{dist*=Math.exp(e.deltaY*0.001);};
draw();
</script></body></html>
"""


def _height_colors(points):
    z = points[:, 2]
    lo, hi = np.percentile(z, 2), np.percentile(z, 98)
    t = np.clip((z - lo) / max(hi - lo, 1e-6), 0, 1)
    # blue -> cyan -> yellow ramp
    return np.stack([t, 0.2 + 0.8 * t, 1.0 - t], axis=1)


def _box_lines(boxes, color):
    if boxes is None or len(boxes) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    corners = corners_3d(np.asarray(boxes, np.float32))   # (N, 8, 3)
    segs = []
    for c in corners:
        for a, b in _EDGES:
            segs.append(c[a])
            segs.append(c[b])
    segs = np.asarray(segs, np.float32)
    cols = np.tile(np.asarray(color, np.float32), (len(segs), 1))
    return segs, cols


def export_scene_html(points, out_path, gt_boxes=None, pred_boxes=None,
                      point_colors=None, max_points=200000):
    """Write an interactive scene to `out_path` (.html).

    Args:
        points: (N, 3+) LiDAR/pseudo-LiDAR points.
        gt_boxes / pred_boxes: (G, 7) [x y z w l h yaw] — drawn green /
            red (the reference viewer's colors).
        point_colors: optional (N, 3) in [0, 1]; default height ramp.
        max_points: uniform subsample cap to keep files light.

    Returns the path written.
    """
    pts = np.asarray(points, np.float32)[:, :3]
    if len(pts) > max_points:
        sel = np.linspace(0, len(pts) - 1, max_points).astype(int)
        pts = pts[sel]
        point_colors = point_colors[sel] if point_colors is not None \
            else None
    cols = np.asarray(point_colors, np.float32) if point_colors is not \
        None else _height_colors(pts)

    gt_seg, gt_col = _box_lines(gt_boxes, (0.1, 0.9, 0.2))
    pr_seg, pr_col = _box_lines(pred_boxes, (0.95, 0.2, 0.2))
    lines = np.concatenate([gt_seg, pr_seg], axis=0)
    line_cols = np.concatenate([gt_col, pr_col], axis=0)

    center = pts.mean(axis=0) if len(pts) else np.zeros(3)
    radius = float(np.percentile(
        np.linalg.norm(pts - center, axis=1), 95)) if len(pts) else 10.0

    data = {
        'pts': np.round(pts, 3).ravel().tolist(),
        'ptsCol': np.round(cols, 3).ravel().tolist(),
        'lines': np.round(lines, 3).ravel().tolist(),
        'lineCol': np.round(line_cols, 2).ravel().tolist(),
        'center': [float(v) for v in center],
        'radius': max(radius, 1.0),
    }
    html = _HTML.replace('__DATA__', json.dumps(data))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, 'w') as f:
        f.write(html)
    return out_path
