#!/bin/bash
# Generate golden outputs by running the reference scripts on the synthetic
# fixtures.  Goldens are committed so the test suite does not need the
# reference checkout.  PYTHONHASHSEED pinned: some reference column orders
# depend on set iteration order.
set -euo pipefail
cd "$(dirname "$0")"
REF=${REF:-/root/reference}
export PYTHONHASHSEED=0
mkdir -p golden
G=golden
D=data

POPS4="-p pop1 -p pop2 -p pop3 -p pop4 --popsFile $D/sim1.pops.txt"

echo "== popgenWindows coordinate =="
python "$REF/popgenWindows.py" -g $D/sim1.geno.gz -f phased \
  -w 50000 -s 25000 -m 100 --minData 0.3 $POPS4 \
  --analysis popFreq popDist popPairDist indPairDist indHet hapStats \
  --writeFailedWindows --addWindowID \
  -o $G/popgen_coord.csv 2>/dev/null

echo "== popgenWindows sites =="
python "$REF/popgenWindows.py" -g $D/sim1.geno.gz -f phased \
  --windType sites -w 250 -O 50 -D 50000 -m 100 $POPS4 \
  --analysis popDist popPairDist \
  -o $G/popgen_sites.csv 2>/dev/null

echo "== popgenWindows predefined =="
python "$REF/popgenWindows.py" -g $D/sim1.geno.gz -f phased \
  --windType predefined --windCoords $D/sim1.windCoords.txt -m 50 $POPS4 \
  --analysis popDist popPairDist --writeFailedWindows --addWindowID \
  -o $G/popgen_predef.csv 2>/dev/null

echo "== popgenWindows haploid mix =="
python "$REF/popgenWindows.py" -g $D/sim_hap.geno.gz -f phased \
  -w 50000 -m 50 -p pop1 -p pop2 --popsFile $D/sim_hap.pops.txt \
  --haploid pop1_ind1 \
  --analysis popDist popPairDist \
  -o $G/popgen_hap.csv 2>/dev/null

echo "== popgenWindows diplo format =="
python "$REF/popgenWindows.py" -g $D/sim_diplo.geno.gz -f diplo \
  -w 50000 -m 50 -p pop1 -p pop2 --popsFile $D/sim_diplo.pops.txt \
  --analysis popDist popPairDist \
  -o $G/popgen_diplo.csv 2>/dev/null

echo "== ABBABABAwindows coordinate =="
python "$REF/ABBABABAwindows.py" -g $D/sim1.geno.gz -f phased \
  -w 50000 -s 25000 -m 50 --minData 0.3 \
  -P1 pop1 -P2 pop2 -P3 pop3 -O pop4 --popsFile $D/sim1.pops.txt \
  --writeFailedWindows \
  -o $G/abba_coord.csv 2>/dev/null

echo "== ABBABABAwindows sites =="
python "$REF/ABBABABAwindows.py" -g $D/sim1.geno.gz -f phased \
  --windType sites -w 100 -m 20 \
  -P1 pop1 -P2 pop2 -P3 pop3 -O pop4 --popsFile $D/sim1.pops.txt \
  -o $G/abba_sites.csv 2>/dev/null

echo "== fourPopWindows =="
# the reference script uses np.NaN (removed in numpy 2); shim it back
python - <<SHIM -g $D/sim1.geno.gz -f phased \
  -w 50000 -s 50000 -m 50 --minData 0.3 \
  -P1 pop1 -P2 pop2 -P3 pop3 -O pop4 --popsFile $D/sim1.pops.txt \
  --writeFailedWindows \
  -o $G/fourpop_coord.csv 2>/dev/null
import numpy, sys, runpy
numpy.NaN = numpy.nan
sys.path.insert(0, "$REF")
runpy.run_path("$REF/fourPopWindows.py", run_name="__main__")
SHIM
echo "== fourPopWindows done =="
echo "== freq baseCounts =="
python "$REF/freq.py" -g $D/sim1.geno.gz -f phased $POPS4 \
  -o $G/freq_counts.tsv 2>/dev/null

echo "== freq derived =="
python "$REF/freq.py" -g $D/sim1.geno.gz -f phased $POPS4 \
  --target derived --minData 2 \
  -o $G/freq_derived.tsv 2>/dev/null

echo "== sfs from genotypes (folded + polarized) =="
python "$REF/sfs.py" -i $D/sim1.geno.gz --inputType genotypes \
  --genoFormat phased -p pop1 -p pop2 --popsFile $D/sim1.pops.txt \
  --doPairs --pref $G/sfs_folded_ --suff .sfs 2>/dev/null
python "$REF/sfs.py" -i $D/sim1.geno.gz --inputType genotypes \
  --genoFormat phased -p pop1 -p pop2 -p pop4 --popsFile $D/sim1.pops.txt \
  --polarized --pref $G/sfs_pol_ --suff .sfs 2>/dev/null
python "$REF/sfs.py" -i $D/sim1.geno.gz --inputType genotypes \
  --genoFormat phased -p pop1 -p pop2 --popsFile $D/sim1.pops.txt \
  --subsample 6 --seed 42 --pref $G/sfs_sub_ --suff .sfs 2>/dev/null
python "$REF/sfs.py" -i $D/sim1.geno.gz --inputType genotypes \
  --genoFormat phased -p pop1 -p pop2 --popsFile $D/sim1.pops.txt \
  --regions scaf1:1-400000 scaf1:400001-900000 scaf2:1-500000 \
  --pref $G/sfs_reg_ --suff .sfs 2>/dev/null

echo "== distMat windows =="
python "$REF/distMat.py" -g $D/sim1.geno.gz -f phased \
  -w 50000 -m 50 --outFormat phylip \
  --windowDataOutFile $G/distmat_wind.data.tsv \
  -o $G/distmat_wind.phy 2>/dev/null

echo "== distMat cat =="
python "$REF/distMat.py" -g $D/sim1.geno.gz -f phased \
  --windType cat --outFormat phylip \
  -o $G/distmat_cat.phy 2>/dev/null

echo "== parseVCF =="
python "$REF/VCF_processing/parseVCF.py" -i $D/sim1.vcf.gz -o $G/vcf_basic.geno 2>/dev/null
python "$REF/VCF_processing/parseVCF.py" -i $D/sim1.vcf.gz --skipIndels --minQual 30 -o $G/vcf_snp_qual.geno 2>/dev/null
python "$REF/VCF_processing/parseVCF.py" -i $D/sim1.vcf.gz --gtf flag=DP min=5 max=50 --gtf flag=GQ min=30 gtTypes=Het -o $G/vcf_gtf.geno 2>/dev/null
python "$REF/VCF_processing/parseVCF.py" -i $D/sim1.vcf.gz --field DP -o $G/vcf_field_dp.tsv 2>/dev/null
python "$REF/VCF_processing/parseVCF.py" -i $D/sim1.vcf.gz --excludeDuplicates --addRefTrack -s s1,s3,s5 -o $G/vcf_dedup_ref.geno 2>/dev/null

echo "== windowStats (np.NaN shim; stdout because of the args.ourFile typo) =="
wshim() { python - "$@" <<SHIM
import numpy, sys, runpy
numpy.NaN = numpy.nan
sys.path.insert(0, "$REF")
sys.argv = ["windowStats.py"] + sys.argv[1:]
runpy.run_path("$REF/windowStats.py", run_name="__main__")
SHIM
}
wshim -i $G/freq_derived.tsv -w 20000 -s 10000 -m 5 > $G/windowstats_coord.csv 2>/dev/null
wshim -i $G/freq_derived.tsv --windType sites -w 50 -O 10 -m 10 --stats mean median min max sd sum q5 q25 q75 q95 > $G/windowstats_sites.csv 2>/dev/null
wshim -i $G/freq_derived.tsv --windType predefined --windCoords $D/sim1.windCoords.txt --columns pop2 pop3 > $G/windowstats_predef.csv 2>/dev/null

echo "== distPaint (np.NaN shim; reference worker crash would hang join) =="
pshim() { timeout 240 python - "$@" <<SHIM
import numpy, sys, runpy
numpy.NaN = numpy.nan
sys.path.insert(0, "$REF")
sys.argv = ["distPaint.py"] + sys.argv[1:]
runpy.run_path("$REF/distPaint.py", run_name="__main__")
SHIM
}
pshim -g $D/sim_paint.geno.gz -w 50000 -s 25000 -m 50 -p pop1 -p pop2 -p pop3 --popsFile $D/sim_paint.pops.txt --writeFailedWindows -T 1 -o $G/distpaint_test.tsv 2>/dev/null
pshim -g $D/sim_paint.geno.gz --windType sites -w 200 -m 100 -p pop1 -p pop2 -p pop3 --popsFile $D/sim_paint.pops.txt --delta_threshold 0.02 --addWindowID -T 1 -o $G/distpaint_delta.tsv 2>/dev/null

echo "== countGenotypePatterns =="
python "$REF/countGenotypePatterns.py" -i $D/sim1.geno.gz -f phased -s pop1_ind1,pop2_ind1,pop3_ind1,pop4_ind1 -o $G/countpat_phased.csv 2>/dev/null
python "$REF/countGenotypePatterns.py" -i $D/sim1.geno.gz -f phased -s pop1_ind1,pop2_ind1,pop3_ind1 --maxAlleles 3 --includeNull --maxSites 2000 -o $G/countpat_max3.csv 2>/dev/null
python "$REF/countGenotypePatterns.py" -i $D/sim_diplo.geno.gz -f diplo -s pop1_ind1,pop1_ind2,pop2_ind1 -o $G/countpat_diplo.csv 2>/dev/null

echo "== genoToSeq / seqToGeno =="
python "$REF/genoToSeq.py" -g $D/sim1.geno.gz -f fasta -M cat --splitPhased -s $G/g2s_cat_split.fa 2>/dev/null
python "$REF/genoToSeq.py" -g $D/sim_paint.geno.gz -f phylip -M contigs --NtoGap --ploidy 1 -s $G/g2s_contigs.phy 2>/dev/null
python "$REF/genoToSeq.py" -g $D/sim_paint.geno.gz -f fasta -M windows --windType sites --windSize 100 --minSites 100 --maxDist 1000000 --overlap 0 --ploidy 1 -s $G/g2s_wind.fa 2>/dev/null
python "$REF/seqToGeno.py" -s $G/g2s_cat_split.fa -f fasta -M samples -C chrA -P 2 2 2 2 2 2 2 2 2 2 2 2 2 2 2 2 2 2 2 2 -g $G/s2g_fused.geno 2>/dev/null
python "$REF/seqToGeno.py" -s $G/g2s_contigs.phy -f phylip -M contigs -N samp1 -g $G/s2g_contigs.geno 2>/dev/null

echo "== mergeGeno (uncompressed output: the reference never closes its gz writer) =="
python "$REF/mergeGeno.py" -i $D/sim1.geno.gz -i $D/sim_hap.geno.gz -f $D/sim.fai --method intersect -o $G/merge_intersect.geno 2>/dev/null
python "$REF/mergeGeno.py" -i $D/sim1.geno.gz -i $D/sim_hap.geno.gz -f $D/sim.fai --method union --unionMin 1 --mustIncludeFirst 1 --missing NN -o $G/merge_union.geno 2>/dev/null
python "$REF/mergeGeno.py" -i $D/sim1.geno.gz -i $D/sim_hap.geno.gz -f $D/sim_small.fai --method all --outputOnly 2 -o $G/merge_all.geno 2>/dev/null

echo "== genoToVCF =="
PYTHONPATH="$REF" python "$REF/VCF_processing/genoToVCF.py" -g $D/sim1.geno.gz -f phased -o $G/g2v_basic.vcf 2>/dev/null
PYTHONPATH="$REF" python "$REF/VCF_processing/genoToVCF.py" -g $D/sim1.geno.gz -f phased -r $D/sim_ref.fa -s pop1_ind1,pop2_ind1,pop3_ind1 -o $G/g2v_ref.vcf 2>/dev/null
PYTHONPATH="$REF" python "$REF/VCF_processing/genoToVCF.py" -g $D/sim_diplo.geno.gz -f diplo -o $G/g2v_diplo.vcf 2>/dev/null

echo "== liftover tools =="
python "$REF/tools/transferScafPos.py" -i $G/freq_derived.tsv -t $D/sim.transfers.txt --header --keepFails -f $G/transfer_freq.fails.tsv -o $G/transfer_freq.tsv 2>/dev/null
python "$REF/tools/fastaTransfer.py" -i $D/sim_ref.fa -t $D/sim.transfers.txt -o $G/transfer_ref.fa 2>/dev/null

echo "== PLINK / Eigenstrat converters =="
python "$REF/tools/genoToPlink.py" -g $D/sim1.geno.gz -f phased --prefix $G/plink_sim1 --makeFAM 2>/dev/null
PYTHONPATH="$REF" python "$REF/tools/genoToEigenstrat.py" -g $D/sim1.geno.gz -f phased --genoOutFile $G/eig_sim1.geno --snpOutFile $G/eig_sim1.snp --indOutFile $G/eig_sim1.ind --chromFile $D/sim.chroms.txt 2>/dev/null >/dev/null
PYTHONPATH="$REF" python "$REF/tools/genoToEigenstrat.py" -g $D/sim1.geno.gz -f phased -s pop1_ind1,pop2_ind1,pop3_ind1 --genoOutFile $G/eig_cum.geno --snpOutFile $G/eig_cum.snp --indOutFile $G/eig_cum.ind --chromFile $D/sim.chroms_id.txt --cumulativePos 2>/dev/null >/dev/null

echo "== mafToGeno =="
python "$REF/tools/mafToGeno.py" -m $D/sim1.maf --ref hg.chr1 --seqNames hg.chr1 pan.chr3 gor.chr2 pon.chr5 --minSeqsRequired 4 -g $G/maf_all.geno 2>/dev/null
python "$REF/tools/mafToGeno.py" -m $D/sim1.maf --ref hg.chr1 --seqNames hg.chr1 pan.chr3 gor.chr2 --renameSeqsAs hg pan gor --renameChromAs chr1 --lowercaseToN --minSize 25 -g $G/maf_sub.geno 2>/dev/null

echo "== CDS tools + parseVCFs (fake tabix on PATH) =="
export PATH="$(pwd)/bin:$PATH"
PYTHONPATH="$REF" python "$REF/codingSiteTypes.py" -a $D/sim.gff3 -f gff3 -r $D/sim_ref.fa -o $G/cst_basic.tsv --ignoreConflicts 2>/dev/null
PYTHONPATH="$REF" python "$REF/codingSiteTypes.py" -a $D/sim.gff3 -f gff3 -r $D/sim_ref.fa -v $D/sim_scaf.vcf.gz -o $G/cst_vcf.tsv --ignoreConflicts 2>/dev/null
PYTHONPATH="$REF" python "$REF/codingSiteTypes.py" -a $D/sim.gtf -f gtf -r $D/sim_ref.fa -o $G/cst_gtf.tsv --noheader 2>/dev/null
PYTHONPATH="$REF" python "$REF/extractCDSAlignments.py" --annotation $D/sim.gff3 -g $D/sim1.geno.gz -o $G/cds_aln.phy 2>/dev/null
PYTHONPATH="$REF" python "$REF/extractCDSAlignments.py" --annotation $D/sim.gff3 -g $D/sim1.geno.gz --no-split --outFormat fasta --includeCoordinates -o $G/cds_aln_nosplit.fa 2>/dev/null
PYTHONPATH="$REF" python "$REF/extractCDSAlignments.py" --annotation $D/sim.gff3 -g $D/sim1.geno.gz -t mRNA03 mRNA08 -o $G/cds_aln_targets.phy 2>/dev/null
PYTHONPATH="$REF/VCF_processing" timeout 300 python "$REF/VCF_processing/parseVCFs.py" -i $D/sim1.vcf.gz -i $D/sim2.vcf.gz -M union --excludeDuplicates -t 1 -o $G/vcfs_union.geno 2>/dev/null
PYTHONPATH="$REF/VCF_processing" timeout 300 python "$REF/VCF_processing/parseVCFs.py" -i $D/sim1.vcf.gz -i $D/sim2.vcf.gz -M intersect --excludeDuplicates -t 1 -o $G/vcfs_intersect.geno 2>/dev/null

echo "== sequence.py (fasta/phylip region extraction) =="
printf 'scaf2\t100\t160\nscaf1\t300\t250\t+\n' > $D/sim.regions.txt
python "$REF/sequence.py" -r scaf1:101-200 'scaf2:50-10' --extendLeft 5 --extendRight 5 < $D/sim_ref.fa > $G/seq_regions.fa 2>/dev/null
python "$REF/sequence.py" -P -f $D/sim.regions.txt --preserveNames -l 60 < $D/sim_ref.fa > $G/seq_regfile.phy 2>/dev/null
python "$REF/sequence.py" -P -l 0 < $D/sim_ref.fa > $D/sim_single.phy 2>/dev/null
python "$REF/sequence.py" -p -r scaf2:1-100:- --truncateNames < $D/sim_single.phy > $G/seq_phy2fa.fa 2>/dev/null

echo "done."
