// Golden-output generator: runs the reference implementation at
// /root/reference over tests/fixtures/rdfc10/*-in.nq and records
// canonical N-Quads + blank-node label maps (or the thrown error) into
// <name>-golden.json.  Run once; outputs are committed so tests never
// need node.
//
// Usage: node tools/make_goldens.js
'use strict';
const fs = require('fs');
const path = require('path');
const canonize = require('/root/reference/lib/index.js');

const DIR = path.join(__dirname, '..', 'tests', 'fixtures', 'rdfc10');
const manifest = JSON.parse(
  fs.readFileSync(path.join(DIR, 'manifest.json'), 'utf8'));

(async () => {
  for(const entry of manifest) {
    const input = fs.readFileSync(
      path.join(DIR, entry.name + '-in.nq'), 'utf8');
    const golden = {name: entry.name};
    if(entry.negativeParse) {
      try {
        await canonize.canonize(input, {
          algorithm: 'RDFC-1.0', inputFormat: 'application/n-quads'});
        golden.error = null;
      } catch(e) {
        golden.error = e.message;
      }
    } else {
      const canonicalIdMap = new Map();
      try {
        const opts = {
          algorithm: 'RDFC-1.0',
          inputFormat: 'application/n-quads',
          maxWorkFactor: entry.maxWorkFactor,
          canonicalIdMap
        };
        if(entry.digest) {
          opts.messageDigestAlgorithm = entry.digest;
          golden.digest = entry.digest;
        }
        golden.output = await canonize.canonize(input, opts);
        golden.idMap = Object.fromEntries(canonicalIdMap);
        golden.maxWorkFactor = entry.maxWorkFactor;
      } catch(e) {
        golden.error = e.message;
        golden.maxWorkFactor = entry.maxWorkFactor;
      }
    }
    fs.writeFileSync(
      path.join(DIR, entry.name + '-golden.json'),
      JSON.stringify(golden, null, 1));
  }
  console.log('wrote goldens for', manifest.length, 'cases');
})();
