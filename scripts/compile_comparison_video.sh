#!/bin/bash
# ffmpeg side-by-side composite with labels (reference compile_comparison_video.sh).
# VIDEO_MODE=SWEEP produces a wipe instead of side-by-side (reference :7-12).
set -e
LEFT=$1; RIGHT=$2; OUT=${3:-comparison.mp4}
FPS=${FPS:-30}
if [ "${VIDEO_MODE:-SIDE}" = "SWEEP" ]; then
  ffmpeg -y -loglevel error -framerate $FPS -i "$LEFT/%05d.png" -framerate $FPS -i "$RIGHT/%05d.png" \
    -filter_complex "[1][0]overlay=x='W*(0.5+0.5*sin(2*PI*t/4))':y=0,drawtext=text='no compensation | compensated':x=10:y=10:fontcolor=white" \
    -pix_fmt yuv420p "$OUT"
else
  ffmpeg -y -loglevel error -framerate $FPS -i "$LEFT/%05d.png" -framerate $FPS -i "$RIGHT/%05d.png" \
    -filter_complex "[0]drawtext=text='no compensation':x=10:y=10:fontcolor=white[l];[1]drawtext=text='compensated':x=10:y=10:fontcolor=white[r];[l][r]hstack" \
    -pix_fmt yuv420p "$OUT"
fi
echo "wrote $OUT"
